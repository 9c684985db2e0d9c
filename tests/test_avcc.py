"""From-scratch H.264 intra baseline codec (sources/avcc.py): VLC table
structure, CAVLC block-codec roundtrips across nC contexts, EBSP escaping,
full encode/decode rate-distortion (the BASELINE.json PSNR>=40dB invariant),
cropping/chroma handling, and the named-error subset contract."""

from __future__ import annotations

import numpy as np
import pytest

from eoreader_spark import codecs
from eoreader_spark.sources import avcc


class TestTables:
    @pytest.mark.parametrize(
        "name,table",
        [("ct0", avcc._CT0), ("ct1", avcc._CT1), ("ct2", avcc._CT2),
         ("ct_cdc", avcc._CT_CHROMA_DC)],
    )
    def test_coeff_token_tables_prefix_free_and_complete(self, name, table):
        codes = list(table.values())
        assert len(set(codes)) == len(codes), f"{name}: duplicate codes"
        for a in codes:
            for b in codes:
                if a is not b:
                    assert not b.startswith(a), f"{name}: {a} prefixes {b}"
        # arity: every (tc, t1) with t1 <= min(tc, 3) present
        max_tc = 4 if name == "ct_cdc" else 16
        want = {(tc, t1) for tc in range(max_tc + 1) for t1 in range(min(tc, 3) + 1)}
        assert set(table) == want

    def test_total_zeros_and_run_tables_prefix_free(self):
        for tc, codes in {**avcc._TZ4, **{100 + k: v for k, v in avcc._TZ_CDC.items()}}.items():
            assert len(set(codes)) == len(codes), tc
            for a in codes:
                for b in codes:
                    if a is not b:
                        assert not b.startswith(a), (tc, a, b)
        for zl, codes in avcc._RUN_BEFORE.items():
            for a in codes:
                for b in codes:
                    if a is not b:
                        assert not b.startswith(a), (zl, a, b)
        # total_zeros arity: tc in 1..15 has 17-tc codes (tz 0..16-tc)
        for tc in range(1, 16):
            assert len(avcc._TZ4[tc]) == 17 - tc

    def test_exp_golomb_roundtrip(self):
        w = avcc._BitWriter()
        vals = list(range(40)) + [255, 1023, 70000]
        svals = [0, 1, -1, 7, -7, 300, -300]
        for v in vals:
            w.ue(v)
        for v in svals:
            w.se(v)
        r = avcc._BitReader(w.rbsp())
        assert [r.ue() for _ in vals] == vals
        assert [r.se() for _ in svals] == svals

    def test_ebsp_escaping_roundtrip(self):
        rng = np.random.RandomState(5)
        for _ in range(200):
            raw = bytes(rng.randint(0, 4, size=rng.randint(1, 40)).astype(np.uint8))
            ebsp = avcc._ebsp(raw)
            assert b"\x00\x00\x00" not in ebsp
            assert b"\x00\x00\x01" not in ebsp
            assert b"\x00\x00\x02" not in ebsp
            assert avcc._rbsp(ebsp) == raw


class TestCavlcBlocks:
    @pytest.mark.parametrize("nC", [-1, 0, 1, 2, 3, 5, 8, 16])
    def test_block_roundtrip_all_contexts(self, nC):
        rng = np.random.RandomState(nC + 10)
        max_coeff = 4 if nC == -1 else 15
        for trial in range(300):
            n_nz = rng.randint(0, max_coeff + 1)
            coeffs = [0] * max_coeff
            for pos in rng.choice(max_coeff, size=n_nz, replace=False):
                mag = int(rng.choice([1, 1, 1, 2, 3, 9, 40, 700]))
                coeffs[pos] = mag if rng.rand() < 0.5 else -mag
            w = avcc._BitWriter()
            avcc._write_block(w, coeffs, nC, max_coeff)
            w.u(0, 8)  # padding so reads never run off the end
            got, tc = avcc._read_block(avcc._BitReader(w.rbsp()), nC, max_coeff)
            assert got == coeffs, (nC, trial, coeffs, got)
            assert tc == sum(1 for c in coeffs if c)

    def test_dc16_roundtrip(self):
        rng = np.random.RandomState(3)
        for trial in range(200):
            coeffs = [int(c) for c in rng.randint(-5, 6, 16) * (rng.rand(16) < 0.4)]
            w = avcc._BitWriter()
            avcc._write_block(w, coeffs, 0, 16)
            w.u(0, 8)
            got, _ = avcc._read_block(avcc._BitReader(w.rbsp()), 0, 16)
            assert got == coeffs


class TestRoundTrip:
    def test_rate_distortion_ladder(self):
        img = codecs.make_image(3, 48, 64, planes=1)[0]
        prev_bytes, prev_psnr = None, None
        for qp in (4, 12, 20):
            data = avcc.encode_h264([img], qp=qp)
            out = avcc.decode_h264(data)[0]
            p = codecs.psnr(img, out)
            assert p >= 40.0, (qp, p)  # BASELINE.json pixel invariant
            if prev_bytes is not None:
                assert len(data) < prev_bytes and p < prev_psnr
            prev_bytes, prev_psnr = len(data), p

    def test_multi_frame_crop_and_chroma(self):
        imgs = [codecs.make_image(s, 30, 44, planes=3) for s in (1, 2, 9)]
        outs = avcc.decode_h264_yuv(avcc.encode_h264(imgs, qp=8))
        assert len(outs) == 3
        for im, (y, cb, cr) in zip(imgs, outs):
            assert y.shape == (30, 44) and cb.shape == (15, 22)
            assert codecs.psnr(im[0], y) >= 45.0
            p = im[1].astype(np.uint16)
            sub = ((p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2]
                    + p[1::2, 1::2] + 2) >> 2).astype(np.uint8)
            assert codecs.psnr(sub, cb) >= 45.0

    def test_decode_deterministic(self):
        img = codecs.make_image(7, 32, 32, planes=1)[0]
        data = avcc.encode_h264([img], qp=16)
        a = avcc.decode_h264(data)[0]
        b = avcc.decode_h264(data)[0]
        assert np.array_equal(a, b)

    def test_smooth_content_compresses_hard(self):
        yy, xx = np.mgrid[0:64, 0:96]
        sm = ((yy * 2 + xx) % 256).astype(np.uint8)
        data = avcc.encode_h264([sm], qp=24)
        assert len(data) < sm.size // 10  # >10:1 on gradients
        assert codecs.psnr(sm, avcc.decode_h264(data)[0]) >= 40.0

    def test_flat_chroma_grayscale_input(self):
        img = codecs.make_image(4, 32, 48, planes=1)[0]
        y, cb, cr = avcc.decode_h264_yuv(avcc.encode_h264([img], qp=6))[0]
        assert np.all(np.abs(cb.astype(int) - 128) <= 1)


class TestSubsetContract:
    def test_cabac_pps_raises_named(self):
        img = codecs.make_image(1, 16, 16, planes=1)[0]
        data = bytearray(avcc.encode_h264([img], qp=10))
        # flip entropy_coding_mode in the PPS: locate the PPS NAL
        nals = data.split(b"\x00\x00\x00\x01")
        pps = bytearray(nals[2])
        # rbsp: ue(0) ue(0) u(1)=0... bits '1' '1' '0' -> set bit 2 of byte 1
        pps[1] |= 0b00100000
        nals[2] = bytes(pps)
        bad = b"\x00\x00\x00\x01".join(bytes(n) for n in nals)
        with pytest.raises(NotImplementedError, match="CABAC"):
            avcc.decode_h264(bad)

    def test_bad_inputs_raise_named(self):
        with pytest.raises(ValueError, match="no frames"):
            avcc.encode_h264([])
        with pytest.raises(ValueError, match="even"):
            avcc.encode_h264([np.zeros((15, 16), np.uint8)])
        with pytest.raises(ValueError, match="QP"):
            avcc.encode_h264([np.zeros((16, 16), np.uint8)], qp=99)
        with pytest.raises(ValueError, match="start code"):
            avcc.decode_h264(b"\xff" * 40)

    def test_truncation_and_bitflips_raise_named_or_decode(self):
        """The corrupt-input contract, locally (the fuzz lane also sweeps
        this format): mutations either decode to something or raise a
        NAMED error — never a bare IndexError/struct.error."""
        img = codecs.make_image(2, 32, 32, planes=1)[0]
        data = avcc.encode_h264([img], qp=12)
        rng = np.random.RandomState(11)
        for i in range(60):
            if i % 2 == 0:
                b = data[: rng.randint(1, len(data))]
            else:
                m = bytearray(data)
                for _ in range(rng.randint(1, 4)):
                    m[rng.randint(0, len(m))] = rng.randint(0, 256)
                b = bytes(m)
            try:
                avcc.decode_h264(b)
            except (ValueError, NotImplementedError, KeyError):
                pass


def _inv4_spec(W: np.ndarray) -> np.ndarray:
    """Scalar per-spec 8.5.12.2 reference: rows first, then columns."""
    W = W.astype(np.int64)
    h = np.zeros((4, 4), np.int64)
    for i in range(4):
        d = W[i]
        e0, e1 = d[0] + d[2], d[0] - d[2]
        e2, e3 = (d[1] >> 1) - d[3], d[1] + (d[3] >> 1)
        h[i] = [e0 + e3, e1 + e2, e1 - e2, e0 - e3]
    v = np.zeros((4, 4), np.int64)
    for j in range(4):
        d = h[:, j]
        e0, e1 = d[0] + d[2], d[0] - d[2]
        e2, e3 = (d[1] >> 1) - d[3], d[1] + (d[3] >> 1)
        v[:, j] = [e0 + e3, e1 + e2, e1 - e2, e0 - e3]
    return (v + 32) >> 6


def _sps_poc0(mb_w: int, mb_h: int) -> bytes:
    """SPS mirroring avcc._sps_rbsp but with pic_order_cnt_type 0."""
    bw = avcc._BitWriter()
    bw.u(66, 8)
    bw.u(0, 8)
    bw.u(30, 8)
    bw.ue(0)      # sps_id
    bw.ue(0)      # log2_max_frame_num_minus4
    bw.ue(0)      # pic_order_cnt_type = 0
    bw.ue(0)      # log2_max_pic_order_cnt_lsb_minus4
    bw.ue(1)      # max_num_ref_frames
    bw.u(0, 1)
    bw.ue(mb_w - 1)
    bw.ue(mb_h - 1)
    bw.u(1, 1)    # frame_mbs_only
    bw.u(1, 1)    # direct_8x8_inference
    bw.u(0, 1)    # no cropping
    bw.u(0, 1)    # no vui
    return bw.rbsp()


def _pps_custom(qp: int, chroma_qp_offset: int = 0,
                deblock_present: bool = True) -> bytes:
    bw = avcc._BitWriter()
    bw.ue(0); bw.ue(0)
    bw.u(0, 1)            # CAVLC
    bw.u(0, 1)
    bw.ue(0); bw.ue(0); bw.ue(0)
    bw.u(0, 1); bw.u(0, 2)
    bw.se(qp - 26)
    bw.se(0)
    bw.se(chroma_qp_offset)
    bw.u(1 if deblock_present else 0, 1)
    bw.u(0, 1); bw.u(0, 1)
    return bw.rbsp()


def _idr_slice(qp: int, init_qp: int, body: "avcc._BitWriter", *,
               poc_lsb: int | None = None, deblock_idc: int | None = 1,
               deblock_offsets: bool = False) -> bytes:
    """IDR slice header in SPEC field order (7.3.3): idr_pic_id BEFORE
    pic_order_cnt_lsb; optional deblock idc (None = PPS says not present)."""
    bw = avcc._BitWriter()
    bw.ue(0)              # first_mb_in_slice
    bw.ue(7)              # slice_type I (all)
    bw.ue(0)              # pps_id
    bw.u(0, 4)            # frame_num
    bw.ue(0)              # idr_pic_id
    if poc_lsb is not None:
        bw.u(poc_lsb, 4)  # pic_order_cnt_lsb (poc_type 0)
    bw.u(0, 1)
    bw.u(0, 1)
    bw.se(qp - init_qp)
    if deblock_idc is not None:
        bw.ue(deblock_idc)
        if deblock_offsets and deblock_idc != 1:
            bw.se(0); bw.se(0)
    bw.bits += body.bits
    return bw.rbsp()


def _frame_body(img3, qp: int) -> "avcc._BitWriter":
    y, cb, cr = avcc._to_yuv(img3)
    body = avcc._BitWriter()
    avcc._encode_frame(body, y.astype(np.int64), cb.astype(np.int64),
                       cr.astype(np.int64), qp)
    return body


class TestAdviceRegressions:
    """Round-8 ADVICE fixes: _inv4 pass order, IDR header field order with
    poc_type 0, deblocking-active rejection, chroma_qp_index_offset."""

    def test_inv4_matches_spec_pass_order(self):
        rng = np.random.RandomState(3)
        for _ in range(200):
            W = rng.randint(-2048, 2048, size=(4, 4)).astype(np.int64)
            assert np.array_equal(avcc._inv4(W), _inv4_spec(W))

    def test_idr_header_spec_order_with_poc_type0(self):
        img = codecs.make_image(5, 32, 48, planes=3)
        qp = 10
        ref = avcc.decode_h264_yuv(avcc.encode_h264([img], qp=qp))[0]
        body = _frame_body(img, qp)
        stream = (avcc._nal(7, _sps_poc0(3, 2))
                  + avcc._nal(8, _pps_custom(qp))
                  + avcc._nal(5, _idr_slice(qp, qp, body, poc_lsb=5)))
        out = avcc.decode_h264_yuv(stream)[0]
        for a, b in zip(ref, out):
            assert np.array_equal(a, b)

    @pytest.mark.parametrize("idc", [0, 2])
    def test_deblock_active_decodes_filtered(self, idc):
        """Round 8: deblock-active streams DECODE (8.7); with one slice
        per picture idc 2 (skip slice boundaries) equals idc 0, and the
        output equals the plain decode run through the engine's own
        filter with the matching grids."""
        img = codecs.make_image(1, 32, 32, planes=1)[0]
        qp = 30
        body = _frame_body(img, qp)

        def stream(dbi):
            return (avcc._nal(7, _sps_poc0(2, 2))
                    + avcc._nal(8, _pps_custom(qp))
                    + avcc._nal(5, _idr_slice(qp, qp, body, poc_lsb=0,
                                              deblock_idc=dbi,
                                              deblock_offsets=True)))

        out = avcc.decode_h264(stream(idc))[0]
        g = avcc._decode_frame(
            avcc._BitReader(_frame_body(img, qp).rbsp()), 2, 2, qp)
        avcc._deblock_frame(g)
        assert np.array_equal(out, g.y.astype(np.uint8))
        plain = avcc.decode_h264(stream(1))[0]
        assert not np.array_equal(out, plain)  # the filter did something

    def test_deblock_pps_absent_defaults_on(self):
        """PPS with no deblocking syntax -> spec default idc 0 (filter
        ON, zero offsets) — matches the explicit-idc-0 decode exactly."""
        img = codecs.make_image(1, 32, 32, planes=1)[0]
        qp = 30
        with_syntax = (avcc._nal(7, _sps_poc0(2, 2))
                       + avcc._nal(8, _pps_custom(qp))
                       + avcc._nal(5, _idr_slice(qp, qp, _frame_body(img, qp),
                                                 poc_lsb=0, deblock_idc=0,
                                                 deblock_offsets=True)))
        without = (avcc._nal(7, _sps_poc0(2, 2))
                   + avcc._nal(8, _pps_custom(qp, deblock_present=False))
                   + avcc._nal(5, _idr_slice(qp, qp, _frame_body(img, qp),
                                             poc_lsb=0, deblock_idc=None)))
        assert np.array_equal(avcc.decode_h264(with_syntax)[0],
                              avcc.decode_h264(without)[0])

    def test_chroma_qp_index_offset_applied(self):
        # Body coded at qp=34 (offset 0).  Declaring offset=-6 in the PPS
        # must shift the chroma dequant to qpc(_chroma_qp(28)=28 vs 33):
        # luma identical, chroma visibly re-scaled.
        img = codecs.make_image(9, 32, 32, planes=3)
        qp = 34
        body = _frame_body(img, qp)

        def stream(off):
            return (avcc._nal(7, _sps_poc0(2, 2))
                    + avcc._nal(8, _pps_custom(qp, chroma_qp_offset=off))
                    + avcc._nal(5, _idr_slice(qp, qp, _frame_body(img, qp),
                                              poc_lsb=0)))

        y0, cb0, cr0 = avcc.decode_h264_yuv(stream(0))[0]
        y1, cb1, cr1 = avcc.decode_h264_yuv(stream(-6))[0]
        assert np.array_equal(y0, y1)
        assert not np.array_equal(cb0, cb1) or not np.array_equal(cr0, cr1)
        # extreme offsets clip into [0, 51] instead of indexing out of range
        for off in (-26, 17):
            avcc.decode_h264_yuv(stream(off))


def _mc_luma_spec(ref, y0, x0, mvx, mvy, bh=16, bw=16):
    """Independent scalar re-derivation of 8.4.2.2.1 with the spec's
    position lettering (G..r), used to pin the vectorized _mc_luma."""
    H, W = ref.shape
    xI, yI = x0 + (mvx >> 2), y0 + (mvy >> 2)
    xF, yF = mvx & 3, mvy & 3
    taps = (1, -5, 20, 20, -5, 1)

    def P(y, x):
        return int(ref[min(max(y, 0), H - 1), min(max(x, 0), W - 1)])

    def hh(y, x):  # unrounded 6-tap at (y, x+1/2)
        return sum(c * P(y, x + k - 2) for k, c in enumerate(taps))

    def vv(y, x):  # unrounded 6-tap at (y+1/2, x)
        return sum(c * P(y + k - 2, x) for k, c in enumerate(taps))

    def cl(v):
        return min(max(v, 0), 255)

    out = np.zeros((bh, bw), np.int64)
    for i in range(bh):
        for jj in range(bw):
            y, x = yI + i, xI + jj
            G = P(y, x)
            Hs = P(y, x + 1)
            M = P(y + 1, x)
            b = cl((hh(y, x) + 16) >> 5)
            s = cl((hh(y + 1, x) + 16) >> 5)
            h = cl((vv(y, x) + 16) >> 5)
            m = cl((vv(y, x + 1) + 16) >> 5)
            j1 = sum(c * hh(y + k - 2, x) for k, c in enumerate(taps))
            j = cl((j1 + 512) >> 10)
            a = (G + b + 1) >> 1
            c_ = (Hs + b + 1) >> 1
            d = (G + h + 1) >> 1
            n = (M + h + 1) >> 1
            e = (b + h + 1) >> 1
            f = (b + j + 1) >> 1
            g = (b + m + 1) >> 1
            i_ = (h + j + 1) >> 1
            k = (j + m + 1) >> 1
            p = (h + s + 1) >> 1
            q = (j + s + 1) >> 1
            r = (m + s + 1) >> 1
            grid = [[G, a, b, c_], [d, e, f, g], [h, i_, j, k], [n, p, q, r]]
            out[i, jj] = grid[yF][xF]
    return out


class TestInterPrediction:
    """Round-8 P-slice subset: quarter-pel MC, CBP table, GOP round-trips,
    hand-built P_Skip/intra-in-P streams, named subset errors."""

    def test_mc_luma_matches_scalar_spec(self):
        rng = np.random.RandomState(8)
        ref = rng.randint(0, 256, size=(40, 56)).astype(np.int64)
        for trial in range(40):
            y0 = int(rng.randint(0, 24))
            x0 = int(rng.randint(0, 40))
            mvx = int(rng.randint(-30, 31))
            mvy = int(rng.randint(-30, 31))
            got = avcc._mc_luma(ref, y0, x0, mvx, mvy, 8, 8)
            want = _mc_luma_spec(ref, y0, x0, mvx, mvy, 8, 8)
            assert np.array_equal(got, want), (trial, y0, x0, mvx, mvy)

    def test_mc_chroma_bilinear_exact(self):
        rng = np.random.RandomState(9)
        ref = rng.randint(0, 256, size=(16, 24)).astype(np.int64)
        for _ in range(40):
            y0, x0 = int(rng.randint(0, 8)), int(rng.randint(0, 16))
            mvx, mvy = int(rng.randint(-40, 41)), int(rng.randint(-40, 41))
            got = avcc._mc_chroma(ref, y0, x0, mvx, mvy, 4, 4)
            xI, yI = x0 + (mvx >> 3), y0 + (mvy >> 3)
            xF, yF = mvx & 7, mvy & 7
            for i in range(4):
                for j in range(4):
                    def P(y, x):
                        return int(ref[min(max(y, 0), 15), min(max(x, 0), 23)])
                    v = ((8 - xF) * (8 - yF) * P(yI + i, xI + j)
                         + xF * (8 - yF) * P(yI + i, xI + j + 1)
                         + (8 - xF) * yF * P(yI + i + 1, xI + j)
                         + xF * yF * P(yI + i + 1, xI + j + 1) + 32) >> 6
                    assert got[i, j] == v

    def test_cbp_inter_table_is_permutation(self):
        assert sorted(avcc._CBP_INTER) == list(range(48))
        assert all(avcc._CBP_INTER[avcc._CBP_INTER_INV[c]] == c
                   for c in range(48))

    def test_gop_roundtrip_psnr_ladder(self):
        rng = np.random.RandomState(0)
        base = codecs.make_image(11, 48, 80, planes=1)[0].astype(np.int64)
        frames = [np.clip(np.roll(base, t, axis=1)
                          + rng.randint(-2, 3, base.shape), 0, 255)
                  .astype(np.uint8) for t in range(8)]
        prev = None
        for qp in (6, 14, 20):
            data = avcc.encode_h264(frames, qp=qp, gop=8)
            outs = avcc.decode_h264(data)
            ps = [codecs.psnr(f, o) for f, o in zip(frames, outs)]
            assert min(ps) >= 40.0, (qp, ps)  # BASELINE invariant incl. P frames
            if prev is not None:
                assert len(data) < prev
            prev = len(data)

    def test_gop_beats_all_intra_on_motion(self):
        base = codecs.make_image(5, 64, 96, planes=3)
        frames = [np.roll(base, shift=(t, 2 * t), axis=(1, 2))
                  for t in range(6)]
        gop = avcc.encode_h264(frames, qp=10, gop=6)
        intra = avcc.encode_h264(frames, qp=10)
        assert len(gop) < 0.6 * len(intra)
        outs = avcc.decode_h264_yuv(gop)
        for f, (y, cb, cr) in zip(frames, outs):
            assert codecs.psnr(f[0], y) >= 45.0

    def test_static_content_p_frames_are_cheap(self):
        img = codecs.make_image(7, 64, 64, planes=3)
        one = avcc.encode_h264([img], qp=16)
        five = avcc.encode_h264([img] * 5, qp=16, gop=5)
        # 4 P frames of a static scene cost a fraction of one more IDR
        assert len(five) - len(one) < 0.5 * len(one)
        outs = avcc.decode_h264_yuv(five)
        assert codecs.psnr(img[0], outs[-1][0]) >= 42.0

    def test_crop_and_multi_gop(self):
        imgs = [codecs.make_image(s, 30, 44, planes=3) for s in (1, 2, 9, 4)]
        outs = avcc.decode_h264_yuv(avcc.encode_h264(imgs, qp=8, gop=4))
        for im, (y, cb, cr) in zip(imgs, outs):
            assert y.shape == (30, 44) and cb.shape == (15, 22)
            assert codecs.psnr(im[0], y) >= 42.0
        frames = [codecs.make_image(20 + t, 32, 48, planes=1)[0]
                  for t in range(7)]
        d = avcc.encode_h264(frames, qp=10, gop=3)  # IDR at 0, 3, 6
        outs = avcc.decode_h264(d)
        assert min(codecs.psnr(f, o) for f, o in zip(frames, outs)) >= 40.0
        assert all(np.array_equal(a, b)
                   for a, b in zip(avcc.decode_h264(d), outs))

    def _p_stream(self, idr_img, p_body_bits, mb_w=2, mb_h=1, p_rbsp=None):
        """IDR frame + one hand-built P slice (body bits or full rbsp)."""
        y, cb, cr = avcc._to_yuv(idr_img)
        body = avcc._BitWriter()
        avcc._encode_frame(body, y.astype(np.int64), cb.astype(np.int64),
                           cr.astype(np.int64), 12)
        if p_rbsp is None:
            p_rbsp = avcc._slice_rbsp_p(12, 12, 1, p_body_bits)
        out = bytearray()
        out += avcc._nal(7, avcc._sps_rbsp(mb_w, mb_h, 16 * mb_w, 16 * mb_h))
        out += avcc._nal(8, avcc._pps_rbsp(12))
        out += avcc._nal(5, avcc._slice_rbsp(12, 12, 0, body))
        out += avcc._nal(1, p_rbsp, ref_idc=2)
        return bytes(out)

    def test_handbuilt_p_skip_and_pcm_intra_in_p(self):
        rng = np.random.RandomState(4)
        img = rng.randint(0, 256, size=(16, 32)).astype(np.uint8)
        pcm_y = rng.randint(0, 256, size=(16, 16)).astype(np.uint8)
        # full slice rbsp by hand: PCM byte-alignment counts HEADER bits too
        pw = avcc._BitWriter()
        pw.ue(0); pw.ue(5); pw.ue(0)   # first_mb, slice_type P, pps_id
        pw.u(1, 4)                     # frame_num
        pw.u(0, 1); pw.u(0, 1); pw.u(0, 1)
        pw.se(0)                       # slice_qp_delta
        pw.ue(1)                       # deblock off
        pw.ue(1)    # mb_skip_run = 1 (first MB is P_Skip)
        pw.ue(30)   # mb_type 30 = I_PCM in P-slice numbering
        pad = (-len("".join(pw.bits))) % 8
        if pad:
            pw.u(0, pad)
        for v in pcm_y.ravel():
            pw.u(int(v), 8)
        for _ in range(2 * 64):   # cb, cr
            pw.u(128, 8)
        stream = self._p_stream(img, None, p_rbsp=pw.rbsp())
        frames = avcc.decode_h264_yuv(stream)
        assert len(frames) == 2
        idr_y = frames[0][0]
        p_y = frames[1][0]
        # MB 0 was skipped with MV (0,0): identical to the reference
        assert np.array_equal(p_y[:, :16], idr_y[:, :16])
        # MB 1 is I_PCM: exact raw samples
        assert np.array_equal(p_y[:, 16:], pcm_y)
        assert np.all(frames[1][1][:, 8:] == 128)

    def test_trailing_skip_run_covers_slice_end(self):
        img = codecs.make_image(6, 16, 32, planes=1)[0]
        pw = avcc._BitWriter()
        pw.ue(2)  # both MBs skipped, no trailing mb data
        frames = avcc.decode_h264_yuv(self._p_stream(img, pw))
        assert np.array_equal(frames[1][0], frames[0][0])

    def test_p_mb_type_bounds(self):
        """P-slice mb_type/sub_mb_type outside their value ranges are
        corrupt streams (every P partition class now decodes)."""
        img = codecs.make_image(6, 16, 32, planes=1)[0]
        pw = avcc._BitWriter()
        pw.ue(0)
        pw.ue(31)  # > 30: not a P or intra-in-P type
        with pytest.raises(ValueError, match="mb_type"):
            avcc.decode_h264(self._p_stream(img, pw))
        pw = avcc._BitWriter()
        pw.ue(0)
        pw.ue(3)   # P_8x8 ...
        for _ in range(4):
            pw.ue(7)  # ... with an out-of-range sub_mb_type
        with pytest.raises(ValueError, match="sub_mb_type"):
            avcc.decode_h264(self._p_stream(img, pw))
        # skip run overrunning the slice is corrupt, not a crash
        pw = avcc._BitWriter()
        pw.ue(40)
        with pytest.raises(ValueError, match="mb_skip_run"):
            avcc.decode_h264(self._p_stream(img, pw))

    def test_p_slice_without_reference_raises(self):
        img = codecs.make_image(6, 16, 32, planes=1)[0]
        stream = self._p_stream(img, avcc._BitWriter())
        nals = stream.split(b"\x00\x00\x00\x01")
        # drop the IDR slice: SPS + PPS + P slice only
        broken = b"\x00\x00\x00\x01".join([nals[0], nals[1], nals[2], nals[4]])
        with pytest.raises(ValueError, match="no reference"):
            avcc.decode_h264(broken)

    def test_b_slice_raises_named(self):
        img = codecs.make_image(6, 16, 32, planes=1)[0]
        y, cb, cr = avcc._to_yuv(img)
        body = avcc._BitWriter()
        avcc._encode_frame(body, y.astype(np.int64), cb.astype(np.int64),
                           cr.astype(np.int64), 12)
        bw = avcc._BitWriter()
        bw.ue(0)
        bw.ue(6)  # slice_type B
        out = (avcc._nal(7, avcc._sps_rbsp(2, 1, 32, 16))
               + avcc._nal(8, avcc._pps_rbsp(12))
               + avcc._nal(5, avcc._slice_rbsp(12, 12, 0, body))
               + avcc._nal(1, bw.rbsp(), ref_idc=2))
        with pytest.raises(NotImplementedError, match="B/SP/SI"):
            avcc.decode_h264(out)

    def test_gop_validation(self):
        img = codecs.make_image(1, 16, 16, planes=1)[0]
        with pytest.raises(ValueError, match="gop"):
            avcc.encode_h264([img], qp=10, gop=0)


# ----------------------------------------------------- in-loop deblocking 8.7


def _db_luma_spec(line, bs, ia, ib):
    """Scalar transcription of 8.7.2.3/8.7.2.4 (luma), written separately
    from the vectorized implementation — the differential oracle."""
    a, b = int(avcc._DB_ALPHA[ia]), int(avcc._DB_BETA[ib])
    p3, p2, p1, p0, q0, q1, q2, q3 = (int(v) for v in line)
    out = [p3, p2, p1, p0, q0, q1, q2, q3]
    if bs == 0 or not (abs(p0 - q0) < a and abs(p1 - p0) < b
                       and abs(q1 - q0) < b):
        return out
    ap, aq = abs(p2 - p0) < b, abs(q2 - q0) < b
    if bs == 4:
        small = abs(p0 - q0) < (a >> 2) + 2
        if ap and small:
            out[3] = (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3
            out[2] = (p2 + p1 + p0 + q0 + 2) >> 2
            out[1] = (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3
        else:
            out[3] = (2 * p1 + p0 + q1 + 2) >> 2
        if aq and small:
            out[4] = (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3
            out[5] = (q2 + q1 + q0 + p0 + 2) >> 2
            out[6] = (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3
        else:
            out[4] = (2 * q1 + q0 + p1 + 2) >> 2
        return out
    tc0 = int(avcc._DB_TC0[ia, bs - 1])
    tc = tc0 + ap + aq
    d = max(-tc, min(tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3))
    out[3] = max(0, min(255, p0 + d))
    out[4] = max(0, min(255, q0 - d))
    if ap:
        out[2] = p1 + max(-tc0, min(tc0,
                          (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1))
    if aq:
        out[5] = q1 + max(-tc0, min(tc0,
                          (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1))
    return out


def _db_chroma_spec(line, bs, ia, ib):
    a, b = int(avcc._DB_ALPHA[ia]), int(avcc._DB_BETA[ib])
    p1, p0, q0, q1 = (int(v) for v in line)
    out = [p1, p0, q0, q1]
    if bs == 0 or not (abs(p0 - q0) < a and abs(p1 - p0) < b
                       and abs(q1 - q0) < b):
        return out
    if bs == 4:
        out[1] = (2 * p1 + p0 + q1 + 2) >> 2
        out[2] = (2 * q1 + q0 + p1 + 2) >> 2
        return out
    tc = int(avcc._DB_TC0[ia, bs - 1]) + 1
    d = max(-tc, min(tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3))
    out[1] = max(0, min(255, p0 + d))
    out[2] = max(0, min(255, q0 - d))
    return out


class TestDeblocking:
    def test_threshold_tables_structure(self):
        """Tables 8-16/8-17 pins: lengths, zero prefixes, monotonicity,
        endpoints (alpha ends 255, beta 18, tc0 row (14,19,25)) and the
        spec's per-index bS ordering tc0[bS=1] <= tc0[bS=2] <= tc0[bS=3]."""
        A, B, T = avcc._DB_ALPHA, avcc._DB_BETA, avcc._DB_TC0
        assert A.shape == (52,) and B.shape == (52,) and T.shape == (52, 3)
        assert not A[:16].any() and not B[:16].any() and not T[:17].any()
        assert (np.diff(A) >= 0).all() and (np.diff(B) >= 0).all()
        assert (np.diff(T, axis=0) >= 0).all()
        assert (np.diff(T, axis=1) >= 0).all()
        assert A[51] == 255 and B[51] == 18
        assert list(T[51]) == [14, 19, 25]
        assert A[26] == 15 and B[26] == 6 and list(T[30]) == [1, 1, 2]

    def test_db_luma_matches_scalar_spec(self):
        rng = np.random.RandomState(42)
        for _ in range(60):
            n = 16
            # half the lines near-flat (filterable), half arbitrary
            base = rng.randint(0, 256)
            seg = rng.randint(0, 256, size=(n, 8)).astype(np.int64)
            seg[::2] = np.clip(
                base + rng.randint(-6, 7, size=(n // 2 + n % 2, 8)), 0, 255)
            bs = rng.randint(0, 5, size=n).astype(np.int64)
            ia, ib = rng.randint(0, 52), rng.randint(0, 52)
            want = np.array([_db_luma_spec(row, int(b), ia, ib)
                             for row, b in zip(seg.tolist(), bs)])
            got = seg.copy()
            avcc._db_luma(got, bs, ia, ib)
            assert np.array_equal(got, want)

    def test_db_chroma_matches_scalar_spec(self):
        rng = np.random.RandomState(43)
        for _ in range(60):
            n = 8
            base = rng.randint(0, 256)
            seg = rng.randint(0, 256, size=(n, 4)).astype(np.int64)
            seg[::2] = np.clip(
                base + rng.randint(-5, 6, size=(n // 2, 4)), 0, 255)
            bs = rng.randint(0, 5, size=n).astype(np.int64)
            ia, ib = rng.randint(0, 52), rng.randint(0, 52)
            want = np.array([_db_chroma_spec(row, int(b), ia, ib)
                             for row, b in zip(seg.tolist(), bs)])
            got = seg.copy()
            avcc._db_chroma(got, bs, ia, ib)
            assert np.array_equal(got, want)

    def test_real_edges_survive(self):
        """|p0-q0| >= alpha means a real content edge: untouched (8.7.2.2)."""
        seg = np.array([[10, 10, 10, 10, 240, 240, 240, 240]] * 4, np.int64)
        before = seg.copy()
        avcc._db_luma(seg, np.full(4, 4, np.int64), 30, 30)
        assert np.array_equal(seg, before)

    def test_edge_bs_rules(self):
        """8.7.2.1 boundary strengths on a synthetic grid: intra MB edge 4,
        intra internal 3, inter coeffs 2, inter MV >= one integer sample 1,
        quiescent inter 0."""
        g = avcc._Grids(2, 1)
        g.ref[:] = 0           # all blocks inter, ref 0 (4x4 granularity)
        assert not avcc._edge_bs(g, 0, 1, 0, True).any()       # quiet inter
        g.mv[:, 4:8] = (4, 0)  # right MB: one integer sample
        assert (avcc._edge_bs(g, 0, 1, 0, True) == 1).all()
        g.mv[:, 4:8] = (3, 0)  # sub-integer
        assert not avcc._edge_bs(g, 0, 1, 0, True).any()
        # round 8 late: PARTITION granularity — only the right MB's lower
        # 16x8 partition moves; the MB edge gets bS 1 on those lines only
        g.mv[2:4, 4:8] = (4, 0)
        assert list(avcc._edge_bs(g, 0, 1, 0, True)) == [0] * 8 + [1] * 8
        g.mv[:, 4:8] = (0, 0)
        g.luma_cnt[2, 4] = 5   # block row 2 of the right MB's first column
        bs = avcc._edge_bs(g, 0, 1, 0, True)
        assert list(bs) == [0] * 8 + [2] * 4 + [0] * 4
        g.ref[0:4, 0:4] = -1                                   # intra left
        assert (avcc._edge_bs(g, 0, 1, 0, True) == 4).all()    # MB edge
        assert (avcc._edge_bs(g, 0, 0, 1, True) == 3).all()    # internal
        assert (avcc._edge_bs(g, 0, 0, 2, False) == 3).all()

    def test_deblock_gop_roundtrip_and_blockiness(self):
        """encode(deblock=True) decodes deterministically; at a coarse QP
        the filter cuts the 4x4-grid blockiness (mean step across block
        boundaries) on smooth content without wrecking PSNR, and P frames
        stay consistent across the filtered reference hand-off."""
        yy, xx = np.mgrid[0:48, 0:64]
        base = np.clip(96 + 0.9 * xx + 0.6 * yy
                       + 18 * np.sin(xx / 9.0) * np.cos(yy / 7.0),
                       0, 255).astype(np.uint8)
        frames = [np.roll(base, (3 * i, 5 * i), axis=(0, 1)) for i in range(4)]
        enc_db = avcc.encode_h264(frames, qp=38, gop=4, deblock=True)
        enc_pl = avcc.encode_h264(frames, qp=38, gop=4, deblock=False)
        out_db = avcc.decode_h264(enc_db)
        out_pl = avcc.decode_h264(enc_pl)
        assert len(out_db) == 4
        # determinism across a second decode (replay-oracle property)
        again = avcc.decode_h264(enc_db)
        for a, b in zip(out_db, again):
            assert np.array_equal(a, b)

        def edge_step(y):
            d = np.abs(np.diff(y.astype(np.int64), axis=1))
            return d[:, 3::4].mean()  # steps across x = 4k-1 | 4k

        def psnr(a, b):
            mse = np.mean((a.astype(np.float64) - b) ** 2)
            return 10 * np.log10(255.0 ** 2 / mse)

        steps_db = np.mean([edge_step(f) for f in out_db])
        steps_pl = np.mean([edge_step(f) for f in out_pl])
        assert steps_db < steps_pl
        p_db = np.mean([psnr(o, f) for o, f in zip(out_db, frames)])
        p_pl = np.mean([psnr(o, f) for o, f in zip(out_pl, frames)])
        assert p_db > p_pl - 0.5  # the filter must not cost real fidelity

    def test_deblock_default_off_byte_identical(self):
        img = codecs.make_image(7, 32, 32, planes=1)[0]
        frames = [img, np.roll(img, 3, axis=1)]
        assert avcc.encode_h264(frames, qp=12, gop=2) == \
            avcc.encode_h264(frames, qp=12, gop=2, deblock=False)


# ------------------------------------------------------------------ Intra_4x4


class TestIntra4x4:
    def test_cbp_intra_table_is_permutation(self):
        assert sorted(avcc._CBP_INTRA) == list(range(48))
        # spec spot pins: codeNum 0 -> 47 (all coded), codeNum 3 -> 0
        assert avcc._CBP_INTRA[0] == 47 and avcc._CBP_INTRA[3] == 0

    def test_pred4_constant_preservation(self):
        """Every prediction mode is a weighted neighbour average: constant
        surroundings must predict the constant exactly."""
        rec = np.full((16, 16), 77, np.int64)
        for mode in range(9):
            assert (avcc._pred4(mode, rec, 8, 8) == 77).all(), mode

    def test_pred4_hand_cases(self):
        """Hand-computed 8.3.1.2 cells: DDL from a ramp top row, VR corner,
        HU tail."""
        rec = np.zeros((16, 16), np.int64)
        rec[7, 8:16] = [10, 20, 30, 40, 50, 60, 70, 80]
        p = avcc._pred4(3, rec, 8, 8)  # Diagonal-Down-Left
        assert p[0, 0] == (10 + 2 * 20 + 30 + 2) >> 2 == 20
        assert p[3, 3] == (70 + 3 * 80 + 2) >> 2 == 78
        rec2 = np.zeros((16, 16), np.int64)
        rec2[7, 7] = 5          # top-left
        rec2[7, 8:12] = 10      # top row
        rec2[8:12, 7] = 9       # left column
        p = avcc._pred4(5, rec2, 8, 8)  # Vertical-Right
        assert p[0, 0] == (5 + 10 + 1) >> 1
        rec3 = np.zeros((16, 16), np.int64)
        rec3[8:12, 7] = [10, 20, 30, 40]
        p = avcc._pred4(8, rec3, 8, 8)  # Horizontal-Up
        assert p[0, 0] == (10 + 20 + 1) >> 1 and p[3, 3] == 40

    def test_pred4_mode_prediction_rules(self):
        i4 = np.full((8, 8), -2, np.int64)
        assert avcc._i4_pred_mode(i4, 0, 3) == 2   # picture edge -> DC
        assert avcc._i4_pred_mode(i4, 3, 0) == 2
        assert avcc._i4_pred_mode(i4, 3, 3) == 2   # neighbours not I4x4
        i4[3, 2], i4[2, 3] = 7, 4                  # left=7, above=4
        assert avcc._i4_pred_mode(i4, 3, 3) == 4   # min rule

    def test_i4x4_roundtrip_psnr(self):
        """encode(intra4x4=True) decodes at >=40 dB on diagonal-edge
        content, and the coded stream genuinely takes the I_4x4 path (its
        bytes differ from the I_16x16 encoding of the same source at the
        same qp)."""
        yy, xx = np.mgrid[0:48, 0:64]
        img = (((xx + yy) // 8) % 2 * 160 + 40).astype(np.uint8)
        d4 = avcc.encode_h264([img], qp=12, intra4x4=True)
        d16 = avcc.encode_h264([img], qp=12)
        assert d4 != d16
        out = avcc.decode_h264(d4)[0]
        assert codecs.psnr(img, out) >= 40.0

    def test_i4x4_multi_frame_gop_with_deblock(self):
        """The full round-8 stack in one stream: I_4x4 intra frames, P
        inter frames predicting from them, in-loop deblocking on — decode
        is deterministic and every frame lands within the qp's fidelity."""
        img = codecs.make_image(11, 32, 48, planes=3)
        frames = [np.stack([np.roll(p, 2 * i, axis=1) for p in img])
                  for i in range(3)]
        data = avcc.encode_h264(frames, qp=14, gop=3, deblock=True,
                                intra4x4=True)
        outs = avcc.decode_h264_yuv(data)
        assert len(outs) == 3
        again = avcc.decode_h264_yuv(data)
        for (y1, *_), (y2, *_) in zip(outs, again):
            assert np.array_equal(y1, y2)
        for fr, (yd, _, _) in zip(frames, outs):
            assert codecs.psnr(fr[0], yd) >= 38.0

    def test_i4x4_default_off_byte_identical(self):
        img = codecs.make_image(13, 32, 32, planes=1)[0]
        assert avcc.encode_h264([img], qp=10) == \
            avcc.encode_h264([img], qp=10, intra4x4=False)


class TestPPartitions:
    """Round-8 (late) P_L0_L0_16x8 / 8x16 two-partition macroblocks."""

    @staticmethod
    def _shear(seed):
        """Frame pair whose motion boundary cuts through the TOP MB row
        (rows 0-7 shift +4 px, rows 8+ shift -4), so a 16x8 split is the
        natural coding choice for those MBs."""
        base = codecs.make_image(seed, 32, 32, planes=1)[0]
        cur = np.empty_like(base)
        cur[:8] = np.roll(base[:8], 4, axis=1)
        cur[8:] = np.roll(base[8:], -4, axis=1)
        return base, cur

    def test_mv_pred_directional_special_cases(self):
        """8.4.1.3 items 2-5: the 16x8/8x16 partitions take a single
        directional neighbour when its reference matches, bypassing the
        median."""
        g = avcc._Grids(3, 2)
        g.ref[:] = 0
        g.done[:] = True
        # MB (1,1) spans blocks [4:8, 4:8].  Top 16x8 partition B-neighbour
        # = block (4, 3) row above; A-neighbour of bottom = block (6, 3).
        g.mv[3, 4] = (12, -8)     # B of top partition
        g.mv[6, 3] = (-16, 20)    # A of bottom partition
        g.mv[4, 3] = (8, -4)      # A of left 8x16 partition
        g.mv[3, 8] = (24, 36)     # C of right 8x16 partition (above-right)
        top = avcc._mv_pred(g, 4, 4, 4, 2, "16x8_top")
        bot = avcc._mv_pred(g, 6, 4, 4, 2, "16x8_bot")
        left = avcc._mv_pred(g, 4, 4, 2, 4, "8x16_left")
        right = avcc._mv_pred(g, 4, 6, 2, 4, "8x16_right")
        assert top == (12, -8)      # mvB, refB == 0
        assert bot == (-16, 20)     # mvA
        assert left == (8, -4)      # mvA of the left partition
        assert right == (24, 36)    # mvC (above-right of the partition)
        # decode-order availability: an undecoded C (and D) falls back to
        # the median path instead of reading unset motion as real data
        g.done[3, 8] = False
        g.done[3, 3] = False
        r2 = avcc._mv_pred(g, 4, 6, 2, 4, "8x16_right")
        assert r2 != (24, 36)

    def test_encoder_splits_on_shear_motion(self):
        prev, cur = self._shear(21)
        yp, cbp_, crp = avcc._to_yuv(prev)
        yc, cbc, crc = avcc._to_yuv(cur)
        body = avcc._BitWriter()
        g = avcc._encode_frame_p(
            body, yc.astype(np.int64), cbc.astype(np.int64),
            crc.astype(np.int64), 8,
            (yp.astype(np.int64), cbp_.astype(np.int64),
             crp.astype(np.int64)))
        # at least one top-row MB carries two distinct MVs (a partition)
        top_mbs_mvs = {tuple(v) for v in g.mv[0:4, :].reshape(-1, 2).tolist()}
        assert len(top_mbs_mvs) >= 2

    def test_partitioned_gop_roundtrip(self):
        prev, cur = self._shear(22)
        data = avcc.encode_h264([prev, cur, prev], qp=8, gop=3)
        outs = avcc.decode_h264(data)
        assert len(outs) == 3
        assert codecs.psnr(cur, outs[1]) >= 40.0
        assert codecs.psnr(prev, outs[2]) >= 40.0
        again = avcc.decode_h264(data)
        for a, b in zip(outs, again):
            assert np.array_equal(a, b)

    def test_partitions_with_deblock_and_i4x4(self):
        """The complete round-8 P surface in one stream: I_4x4 intra,
        partitioned P MBs, in-loop deblocking."""
        prev, cur = self._shear(23)
        data = avcc.encode_h264([prev, cur], qp=26, gop=2, deblock=True,
                                intra4x4=True)
        outs = avcc.decode_h264(data)
        assert len(outs) == 2 and outs[1].shape == (32, 32)
        assert codecs.psnr(cur, outs[1]) >= 28.0


class TestP8x8:
    """Round-8 (late) P_8x8 sub-macroblock partitions."""

    def test_handbuilt_mixed_sub_types_decode_exactly(self):
        """One 16x16-frame MB coded P_8x8 with subs [8x8, 8x4, 4x8, 4x4]
        and hand-chosen mvds; the expected per-block MVs below were
        derived BY HAND from 8.4.1.3 (median + decode-order availability
        + D substitution), and the decoded frame must equal the MC
        assembly of the reference at exactly those MVs — any error in
        sub_mb_type geometry, mvd order or the per-sub-partition
        predictors shifts pixels."""
        img = codecs.make_image(31, 16, 16, planes=1)[0]
        pw = avcc._BitWriter()
        pw.ue(0)      # mb_skip_run
        pw.ue(3)      # mb_type P_8x8
        for s in (0, 1, 2, 3):
            pw.ue(s)  # sub_mb_types
        for mvd in ((4, 8), (0, 4), (0, 0), (8, -8), (0, 0),
                    (0, 0), (4, 4), (0, 0), (-4, -8)):
            pw.se(mvd[0])
            pw.se(mvd[1])
        pw.ue(avcc._CBP_INTER_INV[0])  # cbp 0: no residual
        helper = TestInterPrediction()
        stream = helper._p_stream(img, pw, mb_w=1, mb_h=1)
        idr, p = avcc.decode_h264_yuv(stream)
        ry = idr[0].astype(np.int64)
        rcb = idr[1].astype(np.int64)
        rcr = idr[2].astype(np.int64)
        # hand-derived MVs per sub-partition: (oy, ox, h4, w4, mv)
        expect = [
            (0, 0, 2, 2, (4, 8)),     # P_L0_8x8
            (0, 2, 1, 2, (4, 12)),    # 8x4 top
            (1, 2, 1, 2, (4, 8)),     # 8x4 bottom
            (2, 0, 2, 1, (12, 0)),    # 4x8 left
            (2, 1, 2, 1, (4, 8)),     # 4x8 right
            (2, 2, 1, 1, (4, 8)),     # 4x4 z0
            (2, 3, 1, 1, (8, 12)),    # 4x4 z1
            (3, 2, 1, 1, (4, 8)),     # 4x4 z2
            (3, 3, 1, 1, (0, 0)),     # 4x4 z3
        ]
        want_y = np.empty((16, 16), np.int64)
        want_cb = np.empty((8, 8), np.int64)
        want_cr = np.empty((8, 8), np.int64)
        for oy, ox, h4, w4, (mvx, mvy) in expect:
            py, px = 4 * oy, 4 * ox
            want_y[py : py + 4 * h4, px : px + 4 * w4] = avcc._mc_luma(
                ry, py, px, mvx, mvy, bh=4 * h4, bw=4 * w4)
            cy, cx = py >> 1, px >> 1
            want_cb[cy : cy + 2 * h4, cx : cx + 2 * w4] = avcc._mc_chroma(
                rcb, cy, cx, mvx, mvy, bh=2 * h4, bw=2 * w4)
            want_cr[cy : cy + 2 * h4, cx : cx + 2 * w4] = avcc._mc_chroma(
                rcr, cy, cx, mvx, mvy, bh=2 * h4, bw=2 * w4)
        assert np.array_equal(p[0].astype(np.int64), want_y)
        assert np.array_equal(p[1].astype(np.int64), want_cb)
        assert np.array_equal(p[2].astype(np.int64), want_cr)

    def test_encoder_8x8_probe_on_quadrant_motion(self):
        """Four quadrants moving in four directions force the encoder's
        P_8x8 probe; the stream roundtrips and the MB carries 4 distinct
        MVs."""
        base = codecs.make_image(37, 16, 16, planes=1)[0]
        cur = np.empty_like(base)
        cur[:8, :8] = np.roll(base[:8, :8], 3, axis=1)
        cur[:8, 8:] = np.roll(base[:8, 8:], -3, axis=1)
        cur[8:, :8] = np.roll(base[8:, :8], 2, axis=0)
        cur[8:, 8:] = np.roll(base[8:, 8:], (-2, 2), axis=(0, 1))
        data = avcc.encode_h264([base, cur], qp=8, gop=2)
        outs = avcc.decode_h264(data)
        assert codecs.psnr(cur, outs[1]) >= 38.0
        yp = avcc.decode_h264_yuv(avcc.encode_h264([base], qp=8))[0]
        body = avcc._BitWriter()
        yc, cbc, crc = avcc._to_yuv(cur)
        g = avcc._encode_frame_p(
            body, yc.astype(np.int64), cbc.astype(np.int64),
            crc.astype(np.int64), 8,
            tuple(pl.astype(np.int64) for pl in yp))
        mvs = {tuple(v) for v in g.mv[0:4, 0:4].reshape(-1, 2).tolist()}
        assert len(mvs) >= 3  # the quadrants genuinely split

    def test_p8x8_with_deblock_roundtrip(self):
        base = codecs.make_image(41, 32, 32, planes=1)[0]
        cur = np.empty_like(base)
        cur[:8, :8] = np.roll(base[:8, :8], 4, axis=1)
        cur[:8, 8:] = np.roll(base[:8, 8:], -4, axis=1)
        cur[8:] = np.roll(base[8:], -4, axis=0)
        data = avcc.encode_h264([base, cur, base], qp=30, gop=3,
                                deblock=True)
        outs = avcc.decode_h264(data)
        assert len(outs) == 3
        again = avcc.decode_h264(data)
        for a, b in zip(outs, again):
            assert np.array_equal(a, b)
