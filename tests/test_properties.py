"""Property-based tests (hypothesis) for the deterministic core — the
bit-for-bit claims must hold for ARBITRARY inputs, not just the seeded
fixtures.

The default gate runs each sweep at ~1/6 the tuned example count (keeps
`pytest -q` under the ~6 min bar); the nightly lane (`-m property`, or
EOREADER_PROPERTY_FULL=1) runs the full counts — same tests, no coverage
lost, just deeper sampling."""

import os

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from eoreader_spark import cells, codecs
from eoreader_spark.spatial import pip

pytestmark = pytest.mark.property

_FULL = os.environ.get("EOREADER_PROPERTY_FULL", "") == "1"


def _ex(n: int) -> int:
    """Tuned example count in the nightly lane, reduced in the default gate."""
    return n if _FULL else max(8, n // 6)

finite_lon = st.floats(min_value=-180.0, max_value=179.999999, allow_nan=False)
finite_lat = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)


@settings(max_examples=_ex(200), deadline=None)
@given(lon=finite_lon, lat=finite_lat, res=st.integers(min_value=0, max_value=15))
def test_cell_contains_its_point(lon, lat, res):
    c = cells.encode(np.array([lon]), np.array([lat]), res)
    lo0, la0, lo1, la1 = cells.cell_bounds(c)
    assert lo0[0] - 1e-9 <= lon <= lo1[0] + 1e-9
    assert la0[0] - 1e-9 <= lat <= la1[0] + 1e-9


@settings(max_examples=_ex(200), deadline=None)
@given(lon=finite_lon, lat=finite_lat,
       r1=st.integers(min_value=2, max_value=12), dr=st.integers(min_value=1, max_value=6))
def test_parent_commutes_with_encode(lon, lat, r1, dr):
    fine = cells.encode(np.array([lon]), np.array([lat]), r1 + dr)
    coarse = cells.encode(np.array([lon]), np.array([lat]), r1)
    assert cells.parent(fine, r1)[0] == coarse[0]


@settings(max_examples=_ex(100), deadline=None)
@given(seed=st.integers(min_value=0, max_value=10**9),
       h=st.sampled_from([8, 16, 64]), w=st.sampled_from([8, 32, 64]))
def test_png_roundtrip_any_image(seed, h, w):
    img = codecs.make_image(seed, h, w)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(img)), img)


@settings(max_examples=_ex(100), deadline=None)
@given(seed=st.integers(min_value=0, max_value=10**9))
def test_lossy_always_within_psnr_gate(seed):
    img = codecs.make_image(seed, 32, 32)
    dec = codecs.decode_jpeg(codecs.encode_jpeg(img))
    assert codecs.psnr(img, dec) >= 40.0


@settings(max_examples=_ex(150), deadline=None)
@given(data=st.data())
def test_pip_matches_scalar_reference(data):
    n = data.draw(st.integers(min_value=3, max_value=8))
    pts = data.draw(
        st.lists(
            st.tuples(
                st.floats(min_value=-10, max_value=10, allow_nan=False),
                st.floats(min_value=-10, max_value=10, allow_nan=False),
            ),
            min_size=n, max_size=n, unique=True,
        )
    )
    ring = np.asarray(pts, dtype=np.float64)
    px = np.asarray(
        data.draw(st.lists(st.floats(min_value=-12, max_value=12, allow_nan=False),
                           min_size=20, max_size=20))
    )
    py = np.asarray(
        data.draw(st.lists(st.floats(min_value=-12, max_value=12, allow_nan=False),
                           min_size=20, max_size=20))
    )
    got = pip.points_in_polygon(px, py, ring)

    def scalar(x, y):
        inside = False
        m = len(ring)
        for i in range(m):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % m]
            if (y1 > y) != (y2 > y):
                if x < x1 + (y - y1) * (x2 - x1) / (y2 - y1):
                    inside = not inside
        return inside

    want = np.array([scalar(px[i], py[i]) for i in range(20)])
    assert np.array_equal(got, want)


@settings(max_examples=_ex(100), deadline=None)
@given(
    lon0=st.floats(min_value=-170, max_value=160, allow_nan=False),
    lat0=st.floats(min_value=-80, max_value=70, allow_nan=False),
    dlon=st.floats(min_value=0.01, max_value=10, allow_nan=False),
    dlat=st.floats(min_value=0.01, max_value=10, allow_nan=False),
    res=st.integers(min_value=3, max_value=9),
)
def test_cover_bbox_is_a_cover(lon0, lat0, dlon, dlat, res):
    lon1, lat1 = lon0 + dlon, lat0 + dlat
    _, cc = cells.cover_bbox(
        np.array([lon0]), np.array([lat0]), np.array([lon1]), np.array([lat1]), res
    )
    cover = set(cc.tolist())
    # every interior sample point's cell is covered
    for fx in (0.001, 0.5, 0.999):
        for fy in (0.001, 0.5, 0.999):
            p = cells.encode(
                np.array([lon0 + fx * dlon]), np.array([lat0 + fy * dlat]), res
            )
            assert p[0] in cover


@settings(max_examples=_ex(40), deadline=None)
@given(
    data=st.data(),
    h=st.integers(min_value=8, max_value=48),
    w=st.integers(min_value=8, max_value=48),
    p=st.sampled_from([1, 3, 5]),
)
def test_jfif_roundtrip_any_content(data, h, w, p):
    """REAL JPEG: arbitrary (not closed-form) pixel content survives
    encode/decode with shape intact, deterministic bytes, and PSNR >= 40 at
    the default quality — including non-multiple-of-8 dims (edge-replicated
    pad blocks must not corrupt interior pixels)."""
    from eoreader_spark.sources import jpegc

    rng = np.random.default_rng(data.draw(st.integers(min_value=0, max_value=2**31)))
    img = rng.integers(0, 256, size=(p, h, w), dtype=np.uint8)
    enc = jpegc.encode_jfif(img)
    assert enc == jpegc.encode_jfif(img)
    back = jpegc.decode_jfif(enc)
    assert back.shape == img.shape
    assert codecs.psnr(img, back) >= 40.0


@settings(max_examples=_ex(60), deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**31),
    n1=st.integers(min_value=20, max_value=120),
    n2=st.integers(min_value=20, max_value=120),
    shared_len=st.integers(min_value=8, max_value=40),
)
def test_winnow_guarantee_any_strings(seed, n1, n2, shared_len):
    """The winnowing guarantee holds for arbitrary content: any shared
    substring of length >= w + k - 1 (k=5, w=4 -> 8) produces at least one
    common fingerprint between the two documents."""
    from eoreader_spark.operators.dedup import _winnow_doc

    rng = np.random.default_rng(seed)
    alpha = np.array(list("abcdefgh "))
    shared = "".join(rng.choice(alpha, size=shared_len))
    d1 = "".join(rng.choice(alpha, size=n1)) + shared + "".join(rng.choice(alpha, size=n1))
    d2 = "".join(rng.choice(alpha, size=n2)) + shared + "".join(rng.choice(alpha, size=n2))
    f1 = set(_winnow_doc(np.array([ord(c) for c in d1]), 5, 4)[1].tolist())
    f2 = set(_winnow_doc(np.array([ord(c) for c in d2]), 5, 4)[1].tolist())
    assert f1 & f2, (d1, d2)


# ------------------------------------------------ round-5 codec properties


@settings(max_examples=_ex(25), deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10**9),
    h=st.integers(min_value=1, max_value=80),
    w=st.integers(min_value=1, max_value=80),
    p=st.sampled_from([1, 2, 3]),
    levels=st.integers(min_value=1, max_value=3),
    u16=st.booleans(),
)
def test_jp2_lossless_roundtrip_any_shape(seed, h, w, p, levels, u16):
    """encode_jp2/decode_jp2 must be the identity for ARBITRARY shapes
    (odd dims, 1-pixel edges, subband degeneracy) and both dtypes."""
    from eoreader_spark.sources import jp2

    rng = np.random.RandomState(seed % 2**31)
    hi, dt = (65536, np.uint16) if u16 else (256, np.uint8)
    img = rng.randint(0, hi, size=(p, h, w)).astype(dt)
    back = jp2.decode_jp2(jp2.encode_jp2(img, levels=levels))
    assert back.dtype == dt and np.array_equal(back, img)


@settings(max_examples=_ex(12), deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10**9),
    h=st.integers(min_value=16, max_value=96),
    w=st.integers(min_value=16, max_value=96),
    prog=st.sampled_from(["LRCP", "RLCP", "RPCL", "PCRL", "CPRL"]),
    prec=st.sampled_from([None, 5, 6]),
    nl=st.integers(min_value=1, max_value=3),
    style=st.sampled_from([0x00, 0x01, 0x04, 0x05, 0x2A, 0x2B, 0x2F, 0x10,
                           0x15, 0x3F]),
)
def test_jp2_wire_options_roundtrip_any(seed, h, w, prog, prec, nl, style):
    """Any combination of progression order / precincts / layers /
    code-block styles (incl. bypass and termall multi-segment codewords)
    is still the identity on arbitrary noise content."""
    from eoreader_spark.sources import jp2

    rng = np.random.RandomState(seed % 2**31)
    img = rng.randint(0, 256, size=(1, h, w)).astype(np.uint8)
    d = jp2.encode_jp2(
        img, levels=2, progression=prog, precinct=prec, n_layers=nl,
        cb_style=style,
    )
    assert np.array_equal(jp2.decode_jp2(d), img)


@settings(max_examples=_ex(20), deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10**9),
    h=st.integers(min_value=8, max_value=72),
    w=st.integers(min_value=8, max_value=72),
    p=st.sampled_from([1, 3, 5]),
)
def test_progressive_jfif_equals_baseline_any(seed, h, w, p):
    """Progressive and baseline JPEG carry identical quantized
    coefficients, so their decodes are bit-identical for ANY content —
    incl. the AC-refinement ZRL correction-bit ordering corner."""
    from eoreader_spark.sources import jpegc

    rng = np.random.RandomState(seed % 2**31)
    img = rng.randint(0, 256, size=(p, h, w)).astype(np.uint8)
    assert np.array_equal(
        jpegc.decode_jfif(jpegc.encode_jfif(img, progressive=True)),
        jpegc.decode_jfif(jpegc.encode_jfif(img)),
    )


@settings(max_examples=_ex(30), deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10**9),
    n=st.integers(min_value=0, max_value=6000),
    stereo=st.booleans(),
    lpc=st.sampled_from([None, 2, 8]),
    smooth=st.booleans(),
)
def test_flac_lossless_any_signal(seed, n, stereo, lpc, smooth):
    """FLAC subset encode/decode is the identity for arbitrary 16-bit
    signals across stereo modes and predictor choices."""
    from eoreader_spark.sources import flacc

    rng = np.random.RandomState(seed % 2**31)
    if smooth:  # predictor-friendly content (exercises FIXED/LPC paths)
        t = np.arange(n)
        sig = np.round(
            9000 * np.sin(t * 0.01) + rng.randint(-40, 41, size=n)
        ).astype(np.int64)
    else:  # noise (exercises VERBATIM/escape paths)
        sig = rng.randint(-32768, 32768, size=n).astype(np.int64)
    if stereo:
        sig = np.stack([sig, sig[::-1].copy()])
    back, sr = flacc.decode_flac(flacc.encode_flac(sig, 16000, lpc_order=lpc))
    assert sr == 16000
    assert np.array_equal(back, sig)


@settings(max_examples=_ex(120), deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10**9),
    nc=st.sampled_from([-1, 0, 1, 3, 5, 8, 20]),
    density=st.floats(min_value=0.0, max_value=1.0),
    big=st.booleans(),
)
def test_h264_cavlc_block_roundtrip(seed, nc, density, big):
    """CAVLC residual-block coding is the identity over arbitrary sparse
    coefficient patterns in every nC context (round 7: the newest parser's
    entropy layer gets the property lane's depth)."""
    from eoreader_spark.sources import avcc

    rng = np.random.RandomState(seed % 2**31)
    max_coeff = 4 if nc == -1 else 15
    mags = [1, 2, 3] if not big else [1, 7, 100, 3000]
    coeffs = [
        (int(rng.choice(mags)) * (1 if rng.rand() < 0.5 else -1))
        if rng.rand() < density else 0
        for _ in range(max_coeff)
    ]
    w = avcc._BitWriter()
    avcc._write_block(w, coeffs, nc, max_coeff)
    w.u(0, 8)
    got, tc = avcc._read_block(avcc._BitReader(w.rbsp()), nc, max_coeff)
    assert got == coeffs
    assert tc == sum(1 for c in coeffs if c)


@settings(max_examples=_ex(24), deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10**9),
    h=st.sampled_from([16, 32, 48]),
    w=st.sampled_from([16, 32, 64]),
    qp=st.integers(min_value=0, max_value=40),
)
def test_h264_roundtrip_any_content_decodes_in_range(seed, h, w, qp):
    """encode->decode succeeds for arbitrary content at any QP; output is
    the right shape/dtype, and at low QP meets the PSNR>=40dB invariant."""
    from eoreader_spark.sources import avcc

    rng = np.random.RandomState(seed % 2**31)
    img = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
    out = avcc.decode_h264(avcc.encode_h264([img], qp=qp))[0]
    assert out.shape == (h, w) and out.dtype == np.uint8
    if qp <= 16:
        assert codecs.psnr(img, out) >= 40.0


@settings(max_examples=_ex(20), deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10**9),
    frac_num=st.integers(min_value=1, max_value=9),
    lossy=st.booleans(),
    nl=st.integers(min_value=1, max_value=3),
)
def test_jp2_rate_control_always_decodable(seed, frac_num, lossy, nl):
    """Any budget fraction of any content yields a decodable stream of the
    right shape whose size tracks the budget (codeword bytes bounded;
    headers extra)."""
    from eoreader_spark.sources import jp2

    rng = np.random.RandomState(seed % 2**31)
    img = rng.randint(0, 256, size=(1, 64, 64)).astype(np.uint8)
    kw = dict(levels=2, wavelet="9/7", qstep=1.0) if lossy else dict(levels=2)
    full = jp2.encode_jp2(img, **kw)
    tgt = max(64, len(full) * frac_num // 10)
    d = jp2.encode_jp2(img, n_layers=nl, target_bytes=tgt, **kw)
    out = jp2.decode_jp2(d)
    assert out.shape == img.shape
    floor = len(jp2.encode_jp2(img, target_bytes=1, **kw))
    assert len(d) <= tgt + floor + tgt // 4
