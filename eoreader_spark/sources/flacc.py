"""FLAC subset codec — REAL lossless sample decode, pure numpy/stdlib.

Implements the parts of the public FLAC format (xiph.org spec /
RFC 9639) that cover deterministically synthesizable fixtures:

* stream layout: ``fLaC`` marker, STREAMINFO (+ skipping any other
  metadata block), fixed-blocksize frames;
* frame header: sync 0b11111111111110, blocksize/sample-rate codes
  (incl. the 8/16-bit end-of-header escapes), UTF-8 coded frame number,
  CRC-8 (poly 0x07);
* subframes: CONSTANT, VERBATIM, FIXED predictors order 0-4, and
  quantized-LPC predictors (any order to 32, 12-bit coefficients on the
  encode side) with Rice-coded residuals (4/5-bit parameter, partition
  order 0-15, escape code -> 5-bit raw width); wasted-bits shifts;
* channels: mono plus all four stereo assignments — independent,
  left-side, right-side, mid-side (side channel at bps+1);
* frame footer CRC-16 (poly 0x8005) over the whole frame.

Out-of-subset features raise ``NotImplementedError`` naming the feature
(>2 channels, non-16-bit samples, variable blocksize) — decode of
streams this module encodes is bit-exact and integer-only, so results
are engine-independent (the value-exact-oracle property the gate needs).

Everything here derives from the public spec; the reference
(sertit/eoreader) has no audio path at all — this belongs to the
engine's training-data-pipeline surface (multimodal columns).
"""

from __future__ import annotations

import hashlib

import numpy as np

from eoreader_spark.codecs import corrupt_guard

_FIXED_COEFFS = {
    0: np.array([], dtype=np.int64),
    1: np.array([1], dtype=np.int64),
    2: np.array([2, -1], dtype=np.int64),
    3: np.array([3, -3, 1], dtype=np.int64),
    4: np.array([4, -6, 4, -1], dtype=np.int64),
}

# ------------------------------------------------------------------ CRCs


def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — FLAC frame-header CRC."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — FLAC frame CRC."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


# ---------------------------------------------------------------- bit I/O


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        """FLAC unary: q zero bits then a 1 bit."""
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0, "unaligned"
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.bytepos = pos
        self.bitpos = 0

    def read(self, nbits: int) -> int:
        v = 0
        while nbits > 0:
            avail = 8 - self.bitpos
            take = min(avail, nbits)
            cur = self.data[self.bytepos]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bitpos += take
            nbits -= take
            if self.bitpos == 8:
                self.bitpos = 0
                self.bytepos += 1
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

    def align(self) -> None:
        if self.bitpos:
            self.bitpos = 0
            self.bytepos += 1


# ------------------------------------------------------------ UTF-8 number


def _utf8_number(n: int) -> bytes:
    """FLAC frame numbers use the UTF-8 code-point encoding (up to 36 bits)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (6 * (nbytes - 1) + (7 - nbytes))):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shifts = 6 * (nbytes - 1)
    out.append(lead | (n >> shifts))
    for i in range(nbytes - 1):
        shifts -= 6
        out.append(0x80 | ((n >> shifts) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    n = b0 & (mask - 1)
    for _ in range(nbytes - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation in frame number")
        n = (n << 6) | (b & 0x3F)
    return n


# --------------------------------------------------------------- encoder


def _zigzag(e: np.ndarray) -> np.ndarray:
    return np.where(e >= 0, 2 * e, -2 * e - 1)


def _best_rice_param(u: np.ndarray) -> tuple[int, int]:
    """Exact minimal Rice bit cost over k in [0, 14] -> (k, cost_bits)."""
    best_k, best_cost = 0, int(u.sum()) + len(u)
    for k in range(1, 15):
        cost = int((u >> k).sum()) + len(u) * (k + 1)
        if cost < best_cost:
            best_k, best_cost = k, cost
    return best_k, best_cost


def _quantize_lpc(sig: np.ndarray, order: int, prec: int = 12):
    """Levinson-Durbin on the raw autocorrelation, then quantize the float
    coefficients to ``prec``-bit ints with the largest shift that fits.
    Returns (coefs int64[order], shift) or None when degenerate."""
    x = sig.astype(np.float64)
    r = np.array(
        [float(np.dot(x[: len(x) - j], x[j:])) for j in range(order + 1)]
    )
    if r[0] == 0.0:
        return None
    err = r[0]
    a = np.zeros(order)
    for i in range(order):
        acc = r[i + 1] - float(np.dot(a[:i], r[i:0:-1][:i]))
        if err == 0.0:
            return None
        k = acc / err
        a[: i + 1] = np.concatenate([a[:i] - k * a[:i][::-1], [k]])
        err *= 1.0 - k * k
    cmax = float(np.abs(a).max())
    if not np.isfinite(cmax) or cmax == 0.0:
        return None
    shift = 14
    while shift > 0:
        q = np.round(a * (1 << shift)).astype(np.int64)
        if int(np.abs(q).max()) < (1 << (prec - 1)):
            break
        shift -= 1
    else:
        return None
    q = np.round(a * (1 << shift)).astype(np.int64)
    if int(np.abs(q).max()) >= (1 << (prec - 1)) or not q.any():
        return None
    return q, shift


def _encode_subframe(
    bw: _BitWriter, sig: np.ndarray, bps: int, lpc_order: int | None = None
) -> None:
    n = len(sig)
    if lpc_order is not None and 0 < lpc_order <= 32 and n > lpc_order:
        ql = _quantize_lpc(sig, lpc_order)
        if ql is not None:
            coefs, shift = ql
            # integer prediction (the decoder's exact formula)
            pred = np.zeros(n - lpc_order, dtype=np.int64)
            for j in range(lpc_order):
                pred += coefs[j] * sig[lpc_order - 1 - j : n - 1 - j]
            resid = sig[lpc_order:] - (pred >> shift)
            u = _zigzag(resid)
            if not len(u) or int(u.max()) >> 30 == 0:
                k, _ = _best_rice_param(u) if len(u) else (0, 0)
                bw.write(0b100000 | (lpc_order - 1), 7)  # pad+LPC|order-1
                bw.write(0, 1)  # wasted-bits flag
                for s in sig[:lpc_order]:  # warmup
                    bw.write(int(s), bps)
                bw.write(12 - 1, 4)  # QLP precision code (prec-1)
                bw.write(shift, 5)
                for c in coefs:
                    bw.write(int(c) & 0xFFF, 12)
                bw.write(0, 2)  # residual method 00: 4-bit Rice
                bw.write(0, 4)  # partition order 0
                bw.write(k, 4)
                for e in u:
                    e = int(e)
                    bw.write_unary(e >> k)
                    bw.write(e, k)
                return
    if n and (sig == sig[0]).all():
        bw.write(0b000000, 8)  # pad(1)+type CONSTANT(6)+wasted(1)
        bw.write(int(sig[0]), bps)
        return
    # pick the fixed order (0-4) with the cheapest exact Rice cost
    best = None  # (cost, order, k, resid)
    for order, coef in _FIXED_COEFFS.items():
        if n <= order:
            continue
        pred = np.zeros(n - order, dtype=np.int64)
        for j, c in enumerate(coef):
            pred += c * sig[order - 1 - j : n - 1 - j]
        resid = sig[order:] - pred
        u = _zigzag(resid)
        if len(u) == 0:
            k, cost = 0, 0
        elif int(u.max()) >> 30:
            continue  # residual too wide for a sane Rice code
        else:
            k, cost = _best_rice_param(u)
        total = cost + order * bps
        if best is None or total < best[0]:
            best = (total, order, k, resid)
    verbatim_cost = n * bps
    if best is None or best[0] >= verbatim_cost:
        bw.write(0b000001, 7)  # pad+VERBATIM
        bw.write(0, 1)  # wasted-bits flag
        for s in sig:
            bw.write(int(s), bps)
        return
    _, order, k, resid = best
    bw.write(0b001000 | order, 7)  # pad+FIXED|order
    bw.write(0, 1)  # wasted-bits flag
    for s in sig[:order]:  # warmup
        bw.write(int(s), bps)
    bw.write(0, 2)  # residual method 00: 4-bit Rice
    bw.write(0, 4)  # partition order 0
    bw.write(k, 4)
    for e in _zigzag(resid):
        e = int(e)
        bw.write_unary(e >> k)
        bw.write(e, k)


def _stereo_candidates(left: np.ndarray, right: np.ndarray):
    """(ch_code, [(signal, extra_bps), ...]) for the four stereo layouts."""
    side = left - right
    mid = (left + right) >> 1
    return [
        (1, [(left, 0), (right, 0)]),
        (8, [(left, 0), (side, 1)]),
        (9, [(side, 1), (right, 0)]),
        (10, [(mid, 0), (side, 1)]),
    ]


def encode_flac(
    sig: np.ndarray,
    sample_rate: int = 44100,
    bps: int = 16,
    blocksize: int = 4096,
    lpc_order: int | None = None,
    stereo_mode: str = "auto",
) -> bytes:
    """int samples -> full FLAC stream (STREAMINFO + frames).

    ``sig`` is 1-D (mono) or (2, n) (stereo).  ``lpc_order`` switches the
    subframe coder from fixed-predictor selection to an ``order``-tap
    quantized-LPC predictor (decoder formula exact, so still lossless).
    ``stereo_mode``: 'auto' (cheapest of the four layouts per frame),
    'independent', 'left-side', 'right-side', or 'mid-side'.
    """
    sig = np.asarray(sig, dtype=np.int64)
    nch = 2 if sig.ndim == 2 else 1
    if nch == 2 and sig.shape[0] != 2:
        raise ValueError("stereo input must be shaped (2, n)")
    lim = 1 << (bps - 1)
    if sig.size and (int(sig.min()) < -lim or int(sig.max()) >= lim):
        raise ValueError(f"samples exceed {bps}-bit range")
    if bps != 16:
        raise NotImplementedError("encoder subset: 16-bit only")
    mode_code = {"independent": 1, "left-side": 8, "right-side": 9, "mid-side": 10}
    if nch == 2 and stereo_mode != "auto" and stereo_mode not in mode_code:
        raise ValueError(f"unknown stereo_mode {stereo_mode!r}")
    total = sig.shape[-1]
    frames = []
    n_frames = (total + blocksize - 1) // blocksize
    min_fs = max_fs = 0
    for fi in range(n_frames):
        chunk = sig[..., fi * blocksize : (fi + 1) * blocksize]
        bs = chunk.shape[-1]
        if nch == 1:
            ch_code = 0
            subs = [(chunk, 0)]
        else:
            cands = _stereo_candidates(chunk[0], chunk[1])
            if stereo_mode != "auto":
                ch_code, subs = next(
                    c for c in cands if c[0] == mode_code[stereo_mode]
                )
            else:  # exact per-frame cost: encode each candidate, keep smallest
                best = None
                for code, pair in cands:
                    tw = _BitWriter()
                    for s, extra in pair:
                        _encode_subframe(tw, s, bps + extra, lpc_order)
                    cost = len(tw.buf) * 8 + tw.nbits
                    if best is None or cost < best[0]:
                        best = (cost, code, pair)
                _, ch_code, subs = best
        hdr = bytearray([0xFF, 0xF8])  # sync+fixed blocksize strategy
        bs_code = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5, 256: 8, 512: 9,
                   1024: 10, 2048: 11, 4096: 12, 8192: 13, 16384: 14, 32768: 15}.get(bs)
        tail = b""
        if bs_code is None:
            bs_code, tail = (6, bytes([bs - 1])) if bs <= 256 else (7, (bs - 1).to_bytes(2, "big"))
        hdr.append((bs_code << 4) | 0x0)  # sample rate: from STREAMINFO
        hdr.append((ch_code << 4) | (0b100 << 1))  # channels, 16-bit size code
        hdr += _utf8_number(fi) + tail
        hdr.append(_crc8(bytes(hdr)))
        bw = _BitWriter()
        for s, extra in subs:
            _encode_subframe(bw, s, bps + extra, lpc_order)
        bw.align()
        body = bytes(hdr) + bw.getvalue()
        frame = body + _crc16(body).to_bytes(2, "big")
        frames.append(frame)
        min_fs = len(frame) if min_fs == 0 else min(min_fs, len(frame))
        max_fs = max(max_fs, len(frame))
    # STREAMINFO
    si = bytearray(34)
    si[0:2] = min(blocksize, max(total, 16)).to_bytes(2, "big")
    si[2:4] = blocksize.to_bytes(2, "big")
    si[4:7] = min_fs.to_bytes(3, "big")
    si[7:10] = max_fs.to_bytes(3, "big")
    si[10] = (sample_rate >> 12) & 0xFF
    si[11] = (sample_rate >> 4) & 0xFF
    si[12] = ((sample_rate & 0x0F) << 4) | ((nch - 1) << 1) | ((bps - 1) >> 4)
    si[13] = (((bps - 1) & 0x0F) << 4) | ((total >> 32) & 0x0F)
    si[14:18] = (total & 0xFFFFFFFF).to_bytes(4, "big")
    pcm = (sig.T if nch == 2 else sig).astype("<i2").tobytes()
    si[18:34] = hashlib.md5(pcm).digest()
    return (
        b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + bytes(si)
        + b"".join(frames)
    )


# --------------------------------------------------------------- decoder

_BS_TABLE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608, 8: 256, 9: 512,
             10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384, 15: 32768}


def _read_residual(br: _BitReader, n: int, order: int) -> np.ndarray:
    """Rice-partitioned residual section shared by FIXED and LPC subframes."""
    method = br.read(2)
    if method not in (0, 1):
        raise ValueError("bad residual coding method")
    pbits = 4 if method == 0 else 5
    esc = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    resid = np.empty(n - order, dtype=np.int64)
    idx = 0
    for p in range(nparts):
        cnt = (n >> porder) - (order if p == 0 else 0)
        k = br.read(pbits)
        if k == esc:
            w = br.read(5)
            for _ in range(cnt):
                resid[idx] = br.read_signed(w) if w else 0
                idx += 1
        else:
            for _ in range(cnt):
                q = br.read_unary()
                u = (q << k) | br.read(k)
                resid[idx] = (u >> 1) ^ -(u & 1)
                idx += 1
    return resid


def _decode_subframe(br: _BitReader, n: int, bps: int) -> np.ndarray:
    if br.read(1) != 0:
        raise ValueError("subframe pad bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):  # wasted-bits flag: unary-coded count-1 follows
        wasted = 1 + br.read_unary()
        bps -= wasted
    if stype == 0b000000:  # CONSTANT
        v = br.read(bps)
        v = v - (1 << bps) if v >= (1 << (bps - 1)) else v
        return np.full(n, v << wasted, dtype=np.int64)
    if stype == 0b000001:  # VERBATIM
        out = np.array([br.read_signed(bps) for _ in range(n)], dtype=np.int64)
        return out << wasted
    if 0b001000 <= stype <= 0b001100:  # FIXED order 0-4
        order = stype & 0x07
        warm = [br.read_signed(bps) for _ in range(order)]
        resid = _read_residual(br, n, order)
        out = np.empty(n, dtype=np.int64)
        out[:order] = warm
        coef = _FIXED_COEFFS[order]
        for i in range(order, n):
            pred = 0
            for j, c in enumerate(coef):
                pred += c * out[i - 1 - j]
            out[i] = pred + resid[i - order]
        return out << wasted
    if stype & 0b100000:  # LPC, order = 5 LSBs + 1
        order = (stype & 0x1F) + 1
        warm = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4)
        if prec == 0b1111:
            raise ValueError("invalid QLP precision code")
        prec += 1
        shift = br.read(5)
        if shift >= 16:
            shift -= 32
        if shift < 0:
            raise ValueError("negative QLP shift")
        coef = [br.read_signed(prec) for _ in range(order)]
        resid = _read_residual(br, n, order)
        out = np.empty(n, dtype=np.int64)
        out[:order] = warm
        for i in range(order, n):
            pred = 0
            for j, c in enumerate(coef):
                pred += c * out[i - 1 - j]
            out[i] = (pred >> shift) + resid[i - order]
        return out << wasted
    raise ValueError(f"reserved subframe type {stype:#08b}")


@corrupt_guard("flac")
def decode_flac(data: bytes, verify_md5: bool = True) -> tuple[np.ndarray, int]:
    """FLAC bytes -> (int64 samples, sample_rate).  Mono streams return a
    1-D array, stereo a (2, n) array.  Subset decoder: CONSTANT / VERBATIM /
    FIXED / LPC subframes, wasted bits, mono + all four stereo channel
    assignments (independent, left-side, right-side, mid-side)."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    sr = bps = 0
    nch = 1
    total = -1
    md5_want = b""
    last = False
    while not last:
        hdr = data[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
        if btype == 0:
            si = data[pos + 4 : pos + 4 + 34]
            sr = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
            nch = ((si[12] >> 1) & 0x07) + 1
            if nch > 2:
                raise NotImplementedError("decode subset: mono/stereo only")
            bps = (((si[12] & 0x01) << 4) | (si[13] >> 4)) + 1
            total = ((si[13] & 0x0F) << 32) | int.from_bytes(si[14:18], "big")
            if total == 0:  # RFC 9639 §8.2: 0 means UNKNOWN, not empty —
                total = -1  # decode frames to EOF like the absent-total path
            md5_want = si[18:34]
        pos += 4 + blen
    out: list[np.ndarray] = []
    got = 0
    while pos < len(data) and (total < 0 or got < total):
        start = pos
        if data[pos] != 0xFF or (data[pos + 1] & 0xFC) != 0xF8:
            raise ValueError(f"bad frame sync at byte {pos}")
        if data[pos + 1] & 0x01:
            raise NotImplementedError("variable-blocksize strategy not in subset")
        bs_code = data[pos + 2] >> 4
        sr_code = data[pos + 2] & 0x0F
        ch_code = data[pos + 3] >> 4
        ss_code = (data[pos + 3] >> 1) & 0x07
        if ch_code not in (0, 1, 8, 9, 10):
            raise NotImplementedError(f"channel assignment {ch_code} not in subset")
        if ss_code != 0b100:
            raise NotImplementedError("decode subset: 16-bit samples only")
        if sr_code not in (0,):
            raise NotImplementedError("per-frame sample-rate codes not in subset")
        br = _BitReader(data, pos + 4)
        _frame_no = _read_utf8_number(br)
        if bs_code in _BS_TABLE:
            bs = _BS_TABLE[bs_code]
        elif bs_code == 6:
            bs = br.read(8) + 1
        elif bs_code == 7:
            bs = br.read(16) + 1
        else:
            raise ValueError("reserved blocksize code")
        crc8_got = br.read(8)
        if _crc8(data[start : br.bytepos - 1]) != crc8_got:
            raise ValueError("frame header CRC-8 mismatch")
        if ch_code == 0:  # mono
            sig = _decode_subframe(br, bs, bps)
        elif ch_code == 1:  # independent stereo
            left = _decode_subframe(br, bs, bps)
            right = _decode_subframe(br, bs, bps)
            sig = np.stack([left, right])
        else:  # decorrelated stereo: the side channel carries one extra bit
            if ch_code == 8:  # left-side
                left = _decode_subframe(br, bs, bps)
                side = _decode_subframe(br, bs, bps + 1)
                sig = np.stack([left, left - side])
            elif ch_code == 9:  # right-side
                side = _decode_subframe(br, bs, bps + 1)
                right = _decode_subframe(br, bs, bps)
                sig = np.stack([side + right, right])
            else:  # mid-side
                mid = _decode_subframe(br, bs, bps)
                side = _decode_subframe(br, bs, bps + 1)
                m2 = (mid << 1) | (side & 1)
                sig = np.stack([(m2 + side) >> 1, (m2 - side) >> 1])
        br.align()
        crc16_got = int.from_bytes(data[br.bytepos : br.bytepos + 2], "big")
        if _crc16(data[start : br.bytepos]) != crc16_got:
            raise ValueError("frame CRC-16 mismatch")
        pos = br.bytepos + 2
        if total >= 0 and got + bs > total:
            sig = sig[..., : total - got]
        out.append(sig)
        got += sig.shape[-1]
    sig = (
        np.concatenate(out, axis=-1)
        if out
        else np.empty((nch, 0) if nch == 2 else 0, dtype=np.int64)
    )
    if verify_md5 and md5_want != b"\x00" * 16:
        pcm = (sig.T if sig.ndim == 2 else sig).astype("<i2").tobytes()
        if hashlib.md5(pcm).digest() != md5_want:
            raise ValueError("decoded-PCM MD5 mismatch")
    return sig, sr
