"""Real baseline-JPEG codec (sources/jpegc.py): spec structure, round-trip
fidelity, determinism, and the distributed tile path."""

import struct

import numpy as np
import pytest

from eoreader_spark import codecs
from eoreader_spark.sources import jpegc


@pytest.mark.parametrize(
    "seed,h,w,p",
    [(0, 64, 64, 3), (3, 128, 64, 3), (7, 60, 52, 1), (11, 64, 128, 14)],
)
def test_roundtrip_psnr_above_gate(seed, h, w, p):
    """Shapes survive (incl. non-multiple-of-8 dims and 1/14 planes) and the
    default quality clears the BASELINE PSNR>=40dB invariant on the
    worst-case near-noise synthetic pattern."""
    img = codecs.make_image(seed, h, w, planes=p)
    back = jpegc.decode_jfif(jpegc.encode_jfif(img))
    assert back.shape == img.shape
    assert codecs.psnr(img, back) >= 40.0


def test_encode_deterministic_and_marker_structure():
    img = codecs.make_image(2, 64, 64, planes=3)
    a = jpegc.encode_jfif(img)
    assert a == jpegc.encode_jfif(img)
    assert a[:2] == b"\xff\xd8" and a[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in a[:24]
    # SOF0 present with 3 components, 8-bit, correct dims
    i = a.find(b"\xff\xc0")
    assert i > 0
    prec, hh, ww, nf = struct.unpack(">BHHB", a[i + 4 : i + 10])
    assert (prec, hh, ww, nf) == (8, 64, 64, 3)
    # exactly one DQT, one DC + one AC DHT, three single-component scans
    assert a.count(b"\xff\xdb") == 1
    assert a.count(b"\xff\xc4") == 2
    assert a.count(b"\xff\xda") == 3


def test_quality_tradeoff_monotone():
    img = codecs.make_image(5, 64, 64, planes=3)
    lo = jpegc.encode_jfif(img, quality=70)
    hi = jpegc.encode_jfif(img, quality=95)
    assert len(lo) < len(hi)
    assert codecs.psnr(img, jpegc.decode_jfif(lo)) < codecs.psnr(img, jpegc.decode_jfif(hi))
    # smooth content compresses far better than the noise pattern
    y, x = np.mgrid[0:64, 0:64]
    smooth = np.stack([((x + y) // 4).astype(np.uint8)] * 3)
    assert len(jpegc.encode_jfif(smooth)) < len(hi) // 4
    assert codecs.psnr(smooth, jpegc.decode_jfif(jpegc.encode_jfif(smooth))) >= 50.0


def test_sof2_with_baseline_scan_rejected():
    # a SOF2 marker followed by baseline full-band scans is malformed
    # (progressive DC scans must have Se=0): rejected, not mis-decoded
    img = codecs.make_image(1, 64, 64, planes=3)
    data = bytearray(jpegc.encode_jfif(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # pretend progressive
    with pytest.raises(ValueError, match="spectral band"):
        jpegc.decode_jfif(bytes(data))


def test_arithmetic_and_lossless_sofs_rejected():
    img = codecs.make_image(1, 32, 32, planes=1)
    data = bytearray(jpegc.encode_jfif(img))
    i = data.find(b"\xff\xc0")
    for m in (0xC3, 0xC9, 0xCA):
        data[i + 1] = m
        with pytest.raises(NotImplementedError):
            jpegc.decode_jfif(bytes(data))


def test_sof1_extended_sequential_decodes_as_baseline():
    img = codecs.make_image(6, 48, 56, planes=3)
    data = bytearray(jpegc.encode_jfif(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC1  # extended sequential: identical scan format at 8-bit
    assert np.array_equal(
        jpegc.decode_jfif(bytes(data)), jpegc.decode_jfif(jpegc.encode_jfif(img))
    )


def test_codec_table_dispatch_and_qjpg_coexistence():
    """fmt='jfif' routes to the real codec; legacy fmt='jpeg' (qjpg closed
    form) still decodes — the value-exact oracles depend on it."""
    img = codecs.make_image(4, 64, 64, planes=3)
    back = codecs.decode(codecs.encode(img, "jfif"), "jfif", 64, 64)
    assert codecs.psnr(img, back) >= 40.0
    q = codecs.decode(codecs.encode(img, "jpeg"), "jpeg", 64, 64)
    assert np.array_equal(q, np.clip(np.round(img.astype(np.float32) / 3).astype(np.int32) * 3, 0, 255))


def test_distributed_tile_decode_matches_local(spark):
    """tiles_from_images over jfif payloads == local numpy decode, exactly,
    at any partitioning (the determinism the gate query relies on)."""
    from eoreader_spark.operators import raster

    rows = []
    want = {}
    for j in range(4):
        img = codecs.make_image(j, 64, 64, planes=3)
        data = codecs.encode(img, "jfif")
        rows.append((f"im{j}", bytearray(data), 64, 64, "jfif"))
        want[f"im{j}"] = codecs.decode(data, "jfif", 64, 64)[1].astype(np.float32)
    images = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    for parts in (1, 4):
        tiles = raster.tiles_from_images(images.repartition(parts), plane=1).collect()
        assert len(tiles) == 4
        for r in tiles:
            assert np.array_equal(
                np.asarray(r.px, dtype=np.float32), want[r.image_id].ravel()
            )


# ----------------------------------------------------------- round-4: 4:2:0
def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255**2 / max(mse, 1e-12))


def test_420_roundtrip_smooth_chroma():
    """The real-camera wire format: 2x2 luma sampling, box-downsampled
    chroma, one interleaved MCU scan.  Smooth content (what chroma planes
    look like in practice) reconstructs >= 45 dB on every plane."""
    y, x = np.mgrid[0:80, 0:128]
    img = np.stack([
        (128 + 90 * np.sin(x / 17) * np.cos(y / 13)).astype(np.uint8),
        (128 + 50 * np.sin(x / 29)).astype(np.uint8),
        (128 + 40 * np.cos(y / 23)).astype(np.uint8),
    ])
    dec = jpegc.decode_jfif(jpegc.encode_jfif(img, 95, subsampling="420"))
    assert dec.shape == img.shape
    for i in range(3):
        assert _psnr(img[i], dec[i]) >= 45.0, i


def test_420_odd_dimensions():
    """Dims that are neither MCU (16) nor block (8) multiples: edge
    replication pads, crop restores exact shape."""
    rng = np.random.RandomState(5)
    base = (128 + 60 * np.sin(np.mgrid[0:77, 0:93][1] / 11)).astype(np.uint8)
    img = np.stack([base, base // 2 + 64, base // 3 + 85])
    dec = jpegc.decode_jfif(jpegc.encode_jfif(img, 95, subsampling="420"))
    assert dec.shape == (3, 77, 93)
    assert _psnr(img[0], dec[0]) >= 40.0


def test_420_luma_psnr_on_noise():
    """Full-resolution luma clears 40 dB even on the adversarial noisy
    closed-form pattern (the chroma planes are lossy by design there)."""
    img = codecs.make_image(7, 64, 128, planes=3)
    dec = jpegc.decode_jfif(jpegc.encode_jfif(img, 95, subsampling="420"))
    assert _psnr(img[0], dec[0]) >= 40.0


def test_420_requires_three_planes():
    img = codecs.make_image(1, 64, 64, planes=2)
    with pytest.raises(ValueError, match="3 planes"):
        jpegc.encode_jfif(img, 95, subsampling="420")
    with pytest.raises(ValueError, match="unsupported subsampling"):
        jpegc.encode_jfif(codecs.make_image(1, 64, 64, planes=3), 95, subsampling="422")


def test_444_unchanged_by_new_param():
    img = codecs.make_image(3, 64, 64, planes=3)
    assert jpegc.encode_jfif(img, 95) == jpegc.encode_jfif(img, 95, subsampling="444")


def test_restart_markers_444_and_420():
    """DRI/RSTn (round 5): restart intervals byte-align the entropy stream
    and reset DC predictors every Ri MCUs; decoded pixels are IDENTICAL to
    the no-restart encoding in both scan layouts, and the markers are
    really in the file."""
    img = codecs.make_image(11, 72, 88, planes=3)
    base444 = jpegc.decode_jfif(jpegc.encode_jfif(img, 95))
    base420 = jpegc.decode_jfif(jpegc.encode_jfif(img, 95, subsampling="420"))
    for ri in (1, 5, 17):
        d = jpegc.encode_jfif(img, 95, restart_interval=ri)
        assert b"\xff\xdd" in d and b"\xff\xd0" in d
        assert np.array_equal(jpegc.decode_jfif(d), base444), ri
    for ri in (1, 3, 7):
        d = jpegc.encode_jfif(img, 95, subsampling="420", restart_interval=ri)
        assert np.array_equal(jpegc.decode_jfif(d), base420), ri


def test_restart_marker_resync_recovers_tail():
    """The POINT of restart markers: a byte corrupted inside one interval
    cannot damage blocks past the next RSTm.  Corrupt the middle segment's
    data and check the final interval still decodes identically (per-block
    mismatches stay confined to the corrupted interval's block range)."""
    img = codecs.make_image(13, 64, 64, planes=1)
    d = bytearray(jpegc.encode_jfif(img, 95, restart_interval=16))
    clean = jpegc.decode_jfif(bytes(d))
    # find the first RST0 marker and flip a scan byte just after it
    i = bytes(d).find(b"\xff\xd0")
    assert i > 0
    j = i + 6
    if d[j] == 0xFF or d[j + 1] == 0xFF:  # don't fabricate a marker
        j += 2
    d[j] ^= 0x55
    try:
        hurt = jpegc.decode_jfif(bytes(d))
    except ValueError:
        return  # detected corruption is also acceptable containment
    # blocks before the corrupted interval and after the NEXT marker match
    assert np.array_equal(hurt[:, :16, :], clean[:, :16, :])
    assert np.array_equal(hurt[:, 40:, :], clean[:, 40:, :])


# ------------------------------------------------- progressive (round 5)


def test_progressive_decode_equals_baseline():
    """SOF2 spectral-selection + successive-approximation scans carry the
    SAME quantized coefficients as a baseline encode at equal quality, so
    the two decodes must be bit-identical."""
    for seed, h, w, p in [(0, 64, 64, 3), (4, 40, 56, 1), (9, 33, 47, 5)]:
        img = codecs.make_image(seed, h, w, planes=p)
        prog = jpegc.encode_jfif(img, progressive=True)
        base = jpegc.encode_jfif(img)
        assert np.array_equal(jpegc.decode_jfif(prog), jpegc.decode_jfif(base))


def test_progressive_noise_stress():
    """Random near-noise content exercises the hard AC-refinement corners
    (long zero-history runs with significant coefficients interleaved past
    the 16th zero — the ZRL correction-bit ordering case)."""
    rng = np.random.RandomState(7)
    for _ in range(4):
        hh, ww, pp = rng.randint(16, 100), rng.randint(16, 100), rng.randint(1, 5)
        img = rng.randint(0, 256, size=(pp, hh, ww)).astype(np.uint8)
        assert np.array_equal(
            jpegc.decode_jfif(jpegc.encode_jfif(img, progressive=True)),
            jpegc.decode_jfif(jpegc.encode_jfif(img)),
        )


def test_progressive_marker_structure_and_scan_script():
    img = codecs.make_image(2, 64, 64, planes=3)
    a = jpegc.encode_jfif(img, progressive=True)
    assert a == jpegc.encode_jfif(img, progressive=True)  # deterministic
    i = a.find(b"\xff\xc2")
    assert i > 0 and a.find(b"\xff\xc0") == -1  # SOF2, no SOF0
    prec, hh, ww, nf = struct.unpack(">BHHB", a[i + 4 : i + 10])
    assert (prec, hh, ww, nf) == (8, 64, 64, 3)
    # scan script: 1 interleaved DC first + 1 DC refine + 3 AC first +
    # 3 AC refine = 8 SOS segments
    assert a.count(b"\xff\xda") == 8


def test_progressive_psnr_and_size():
    img = codecs.make_image(5, 96, 80, planes=3)
    prog = jpegc.encode_jfif(img, progressive=True)
    back = jpegc.decode_jfif(prog)
    assert codecs.psnr(img, back) >= 40.0
    # progressive entropy coding should not balloon the payload
    assert len(prog) < len(jpegc.encode_jfif(img)) * 1.1


def test_progressive_many_components_groups():
    # >4 components forces multiple interleaved DC scan groups (Ns<=4)
    img = codecs.make_image(8, 48, 40, planes=9)
    prog = jpegc.encode_jfif(img, progressive=True)
    base = jpegc.encode_jfif(img)
    assert np.array_equal(jpegc.decode_jfif(prog), jpegc.decode_jfif(base))


def test_progressive_flat_image_eob_runs():
    # flat content: AC bands are all zero -> pure EOB path in every scan
    img = np.full((1, 64, 64), 200, dtype=np.uint8)
    prog = jpegc.encode_jfif(img, progressive=True)
    assert np.array_equal(
        jpegc.decode_jfif(prog), jpegc.decode_jfif(jpegc.encode_jfif(img))
    )


def test_progressive_restart_markers_rejected_loudly():
    img = codecs.make_image(1, 32, 32, planes=1)
    data = bytearray(jpegc.encode_jfif(img, progressive=True))
    # splice a DRI segment before the first quantization table
    i = data.find(b"\xff\xdb")
    data[i:i] = b"\xff\xdd\x00\x04\x00\x02"
    with pytest.raises(NotImplementedError, match="restart"):
        jpegc.decode_jfif(bytes(data))


def test_progressive_encode_rejects_420_and_restarts():
    img = codecs.make_image(1, 32, 32, planes=3)
    with pytest.raises(ValueError, match="4:4:4"):
        jpegc.encode_jfif(img, progressive=True, subsampling="420")
    with pytest.raises(ValueError, match="4:4:4"):
        jpegc.encode_jfif(img, progressive=True, restart_interval=4)
