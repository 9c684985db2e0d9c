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
    def test_deblock_active_raises_named(self, idc):
        img = codecs.make_image(1, 16, 16, planes=1)[0]
        body = _frame_body(img, 12)
        stream = (avcc._nal(7, _sps_poc0(1, 1))
                  + avcc._nal(8, _pps_custom(12))
                  + avcc._nal(5, _idr_slice(12, 12, body, poc_lsb=0,
                                            deblock_idc=idc,
                                            deblock_offsets=True)))
        with pytest.raises(NotImplementedError, match="deblocking"):
            avcc.decode_h264(stream)

    def test_deblock_pps_absent_default_on_raises_named(self):
        img = codecs.make_image(1, 16, 16, planes=1)[0]
        body = _frame_body(img, 12)
        stream = (avcc._nal(7, _sps_poc0(1, 1))
                  + avcc._nal(8, _pps_custom(12, deblock_present=False))
                  + avcc._nal(5, _idr_slice(12, 12, body, poc_lsb=0,
                                            deblock_idc=None)))
        with pytest.raises(NotImplementedError, match="deblocking"):
            avcc.decode_h264(stream)

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
