"""Corrupt-input contract for every from-scratch decoder: malformed bytes
must raise a NAMED error (ValueError / NotImplementedError / KeyError) and
must return promptly — never a bare IndexError/struct.error from deep in a
marker walk, never an attacker-sized allocation, never a hang.

Why this matters at 100 TB: decoders run inside mapInPandas batches; a bare
low-level exception (or a 4 GB struct-format string built from a corrupt
count — the fuzzer found exactly that in the TIFF IFD reader) kills the
whole Arrow batch or the executor, instead of letting the ingest job
quarantine one bad row.  codecs.corrupt_guard is the enforcement point.

Deterministic seeds; the default gate runs a reduced mutation count, the
nightly property lane (`-m property` / EOREADER_PROPERTY_FULL=1) runs more.
"""

from __future__ import annotations

import os
import signal

import numpy as np
import pytest

from eoreader_spark import codecs
from eoreader_spark.operators import multimodal as mm
from eoreader_spark.sources import avcc, flacc, hdf5, jp2, jpegc

N = 120 if os.environ.get("EOREADER_PROPERTY_FULL") == "1" else 24
OK = (ValueError, NotImplementedError, KeyError)

pytestmark = pytest.mark.property


def _img():
    return codecs.make_image(3, 48, 40, planes=2)


def _streams():
    img = _img()
    sig = (np.arange(4000) % 3000 - 1500).astype(np.int64)
    return {
        "jp2": (jp2.encode_jp2(img, levels=2, tile=32), jp2.decode_jp2),
        "jfif": (jpegc.encode_jfif(img[:1]), jpegc.decode_jfif),
        "png": (codecs.encode_png(codecs.make_image(3, 32, 32)),
                lambda b: codecs.decode(b, "png", 32, 32)),
        "tiff": (codecs.encode_tiff(img),
                 lambda b: codecs.decode(b, "tiff", 48, 40)),
        "nc": (hdf5.encode_nc(img), hdf5.decode_nc),
        "flac": (flacc.encode_flac(sig, 16000), flacc.decode_flac),
        "mjpeg": (mm.encode_mjpeg([img[:1], img[:1]]), mm.split_mjpeg),
        "mp4": (mm.encode_mp4_mjpeg([img[:1], img[:1]]), mm.split_mp4_mjpeg),
        "h264": (avcc.encode_h264([img[0], img[1]], qp=12), avcc.decode_h264),
        "mp4_avc1": (mm.encode_mp4_h264([img[0], img[1]], qp=12),
                     lambda b: [avcc.decode_h264(f) for f in mm.split_mp4_avc1(b)]),
        "wav": (mm.encode_wav(np.sin(np.arange(800) / 20.0) * 0.4, 8000),
                mm.decode_audio),
    }


@pytest.mark.parametrize("fmt", sorted(_streams()))
def test_corrupt_inputs_raise_named_and_promptly(fmt):
    data, dec = _streams()[fmt]
    dec(data)  # the pristine stream must decode
    import zlib

    rng = np.random.RandomState(zlib.crc32(fmt.encode()))

    fired = {"hang": False}

    def _alarm(sig_, frm):
        fired["hang"] = True
        raise TimeoutError(f"{fmt}: corrupt-input decode exceeded budget")

    old = signal.signal(signal.SIGALRM, _alarm)
    try:
        for i in range(N):
            if i % 2 == 0:
                b = bytes(data[: rng.randint(1, len(data))])  # truncate
            else:
                mut = bytearray(data)  # bit-flip 1-3 bytes
                for _ in range(rng.randint(1, 4)):
                    mut[rng.randint(0, len(mut))] = rng.randint(0, 256)
                b = bytes(mut)
            signal.alarm(20)
            try:
                dec(b)  # decoding to a wrong-but-well-formed result is fine
            except OK:
                pass  # the contract: named, catchable
            finally:
                signal.alarm(0)
    finally:
        signal.signal(signal.SIGALRM, old)
    assert not fired["hang"]


def test_corrupt_archives_and_xml_raise_named():
    """Archive scan (zip/tar.gz) and XML metadata flatten obey the same
    contract: stdlib BadZipFile/TarError/BadGzipFile/ParseError surface as
    named ValueError."""
    import io
    import tarfile
    import zipfile

    from eoreader_spark.sources import archive, metadata

    zb = io.BytesIO()
    with zipfile.ZipFile(zb, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("prod/MTD.xml", "<a><b>1</b></a>" * 20)
        z.writestr("prod/img.jp2", b"\x00" * 500)
    tb = io.BytesIO()
    with tarfile.open(fileobj=tb, mode="w:gz") as t:
        d = b"hello" * 100
        info = tarfile.TarInfo("p/metadata.xml")
        info.size = len(d)
        t.addfile(info, io.BytesIO(d))
    xml = "<root xmlns='urn:x'><g a='1'><v>2.5</v></g></root>"
    rng = np.random.RandomState(2)

    for data, fn in (
        (zb.getvalue(), lambda b: archive._members(b, True)),
        (tb.getvalue(), lambda b: archive._members(b, True)),
    ):
        fn(data)  # pristine works
        for i in range(N):
            if i % 2 == 0:
                b = bytes(data[: rng.randint(1, len(data))])
            else:
                m = bytearray(data)
                for _ in range(rng.randint(1, 4)):
                    m[rng.randint(0, len(m))] = rng.randint(0, 256)
                b = bytes(m)
            try:
                fn(b)
            except OK:
                pass
    metadata.xml_to_pairs(xml)
    for i in range(N):
        s = xml[: rng.randint(1, len(xml))]
        try:
            metadata.xml_to_pairs(s)
        except OK:
            pass
