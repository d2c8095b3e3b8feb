"""Real-decoder tests for ops.multimodal: BMP/PNG/PPM/PGM pixels decoded
exactly, WAV samples decoded via stdlib wave, resize, and the Dataset-level
actor-pool plumbing."""

import io
import struct
import wave
import zlib

import numpy as np
import pyarrow as pa
import pytest

from morph_kgc_ray.ops.multimodal import (
    AudioDecodeKernel,
    ImageDecodeKernel,
    decode_image_bytes,
    image_features,
    resize_nearest,
)


def _rgb(h, w, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def encode_bmp(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body = b''.join(px[y, :, ::-1].tobytes() + b'\0' * pad for y in range(h - 1, -1, -1))
    hdr = struct.pack('<2sIHHI', b'BM', 54 + len(body), 0, 0, 54)
    dib = struct.pack('<IiiHHIIiiII', 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return hdr + dib + body


def encode_png(px: np.ndarray, filter_type: int = 0) -> bytes:
    h, w, ch = px.shape
    color = {1: 0, 3: 2, 4: 6}[ch]

    def chunk(ctype, data):
        return (struct.pack('>I', len(data)) + ctype + data
                + struct.pack('>I', zlib.crc32(ctype + data) & 0xFFFFFFFF))

    raw = b''
    prev = np.zeros(w * ch, np.int32)
    for y in range(h):
        line = px[y].reshape(-1).astype(np.int32)
        if filter_type == 0:
            enc = line
        elif filter_type == 2:  # Up
            enc = (line - prev) & 0xFF
        elif filter_type == 1:  # Sub
            left = np.concatenate([np.zeros(ch, np.int32), line[:-ch]])
            enc = (line - left) & 0xFF
        raw += bytes([filter_type]) + enc.astype(np.uint8).tobytes()
        prev = line
    ihdr = struct.pack('>IIBBBBB', w, h, 8, color, 0, 0, 0)
    return (b'\x89PNG\r\n\x1a\n' + chunk(b'IHDR', ihdr)
            + chunk(b'IDAT', zlib.compress(raw)) + chunk(b'IEND', b''))


def encode_ppm(px: np.ndarray) -> bytes:
    h, w, ch = px.shape
    magic = b'P6' if ch == 3 else b'P5'
    return magic + f'\n# comment\n{w} {h}\n255\n'.encode() + px.tobytes()


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, 'wb') as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype(np.int16).tobytes())
    return buf.getvalue()


def test_bmp_roundtrip_exact_pixels():
    px = _rgb(5, 7, seed=1)
    got = decode_image_bytes(encode_bmp(px))
    assert got is not None and got.shape == (5, 7, 3)
    assert (got == px).all()


@pytest.mark.parametrize('filter_type', [0, 1, 2])
def test_png_roundtrip_exact_pixels(filter_type):
    px = _rgb(6, 4, seed=2)
    got = decode_image_bytes(encode_png(px, filter_type))
    assert got is not None and (got == px).all()


def test_png_grayscale_and_rgba():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4, 1)
    got = decode_image_bytes(encode_png(g))
    assert got is not None and (got == g).all()
    rgba = np.arange(48, dtype=np.uint8).reshape(3, 4, 4)
    got = decode_image_bytes(encode_png(rgba))
    assert got is not None and (got == rgba).all()


def test_ppm_pgm_roundtrip():
    px = _rgb(3, 3, seed=3)
    assert (decode_image_bytes(encode_ppm(px)) == px).all()
    grey = np.arange(9, dtype=np.uint8).reshape(3, 3, 1)
    assert (decode_image_bytes(encode_ppm(grey)) == grey).all()


def test_text_payload_never_misdecodes():
    # payloads with magic-like prefixes but invalid structure fall through
    for s in [b'BM this is not a bitmap at all, just text',
              b'P6 not really a pixmap', b'RIFFxxxx not audio', b'hello']:
        assert decode_image_bytes(s) is None


def test_decode_kernel_real_vs_fake_paths():
    px = _rgb(4, 4, seed=4)
    k = ImageDecodeKernel(feature_dim=8)
    t = pa.table({'image': pa.array([encode_bmp(px), b'not an image'], pa.large_binary())})
    out = k(t)
    assert out['width'][0].as_py() == 4 and out['height'][0].as_py() == 4
    feats = np.array(out['features'][0].as_py())
    want = image_features(px, 8)
    assert np.allclose(feats, want, atol=1e-6)
    # mean features are the real per-channel means
    assert np.allclose(want[:3], px.reshape(-1, 3).mean(axis=0) / 255.0, atol=1e-6)
    # fake path still deterministic for unsupported bytes
    out2 = k(t)
    assert out['width'][1].as_py() == out2['width'][1].as_py()


def test_resize_nearest_identity_and_downscale():
    px = _rgb(8, 8, seed=5)
    assert (resize_nearest(px, 8, 8) == px).all()
    small = resize_nearest(px, 4, 4)
    assert small.shape == (4, 4, 3)
    assert (small == px[::2, ::2]).all()


def test_wav_decode_real_stats():
    rate = 8000
    tt = np.arange(rate, dtype=np.float64) / rate
    samples = (np.sin(2 * np.pi * 440 * tt) * 10000)
    k = AudioDecodeKernel()
    t = pa.table({'audio': pa.array([encode_wav(samples, rate)], pa.large_binary())})
    out = k(t)
    assert out['sample_rate'][0].as_py() == rate
    assert out['n_samples'][0].as_py() == rate
    assert abs(out['duration_s'][0].as_py() - 1.0) < 1e-9
    x = samples.astype(np.int16).astype(np.float64)
    assert abs(out['rms'][0].as_py() - float(np.sqrt(np.mean(x * x)))) < 1e-6
    # 440 Hz sine crosses zero ~880 times/s
    assert 0.08 < out['zcr'][0].as_py() < 0.15


def test_audio_strict_raises_on_non_wav():
    k = AudioDecodeKernel(strict=True)
    t = pa.table({'audio': pa.array([b'not audio'], pa.large_binary())})
    with pytest.raises(NotImplementedError):
        k(t)


def test_dataset_level_ops(ray_session):
    import ray.data as rd
    from morph_kgc_ray.ops.multimodal import decode_audio, decode_images, resize_images
    px = _rgb(6, 6, seed=6)
    rows = [{'doc_id': 0, 'image': encode_bmp(px)},
            {'doc_id': 1, 'image': encode_png(px)},
            {'doc_id': 2, 'image': b'unsupported bytes'}]
    out = decode_images(rd.from_items(rows), concurrency=1, batch_size=2).to_pandas()
    assert list(out.loc[out.doc_id == 0, 'width'])[0] == 6
    assert list(out.loc[out.doc_id == 1, 'height'])[0] == 6
    rz = resize_images(rd.from_items(rows), 3, 3, concurrency=1).to_pandas()
    assert len(rz.loc[rz.doc_id == 0, 'resized'].iloc[0]) == 3 * 3 * 3
    assert rz.loc[rz.doc_id == 2, 'resized'].iloc[0] is None
    au = decode_audio(rd.from_items(
        [{'doc_id': 0, 'audio': encode_wav(np.zeros(100))}]), concurrency=1).to_pandas()
    assert au['n_samples'][0] == 100
