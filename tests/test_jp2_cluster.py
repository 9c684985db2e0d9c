"""Multi-JVM leg for the tile-parallel JP2 scene decode: the reassembled
tiles must be BIT-IDENTICAL between a threads-mode session and a real
multi-executor local-cluster (separate executor JVMs, netty shuffle) —
the north-rule invariance claim applied to the round-5 operator."""

import subprocess
import sys
import textwrap

import numpy as np
import pytest

pytestmark = [
    pytest.mark.cluster,  # separate driver+executor JVMs, ~60 s per leg
]

_LEG = textwrap.dedent(
    """
    import glob, hashlib, sys
    import numpy as np
    from eoreader_spark.session import get_spark
    from eoreader_spark.operators import raster

    master, root = sys.argv[1], sys.argv[2]
    spark = get_spark("jp2cluster", cpus=4, master=master)
    files = sorted(glob.glob(root + "/*.jp2"))
    fdf = spark.createDataFrame(
        [(f"sc{i}", p) for i, p in enumerate(files)],
        "image_id string, path string",
    )
    rows = raster.jp2_scene_tiles(fdf, plane=0).collect()
    h = hashlib.md5()
    for r in sorted(rows, key=lambda r: (r.image_id, r.tile_y, r.tile_x)):
        h.update(f"{r.image_id},{r.tile_x},{r.tile_y},{r.th},{r.tw}".encode())
        h.update(np.asarray(r.px, dtype=np.float32).tobytes())
    print("DIGEST " + h.hexdigest())
    """
)


def test_jp2_scene_tiles_cluster_equals_threads(tmp_path):
    from eoreader_spark.sources import jp2

    rng = np.random.RandomState(17)
    for j in range(2):
        img = rng.randint(0, 256, size=(1, 128, 128)).astype(np.uint8)
        kw = dict(precinct=5, progression="RPCL", use_eph=True) if j else {}
        with open(tmp_path / f"s{j}.jp2", "wb") as f:
            f.write(jp2.encode_jp2(img, levels=2, tile=64, **kw))

    digests = []
    for master in ("local[4]", "local-cluster[2,2,2048]"):
        p = subprocess.run(
            [sys.executable, "-c", _LEG, master, str(tmp_path)],
            capture_output=True, text=True, timeout=420,
        )
        lines = [l for l in p.stdout.splitlines() if l.startswith("DIGEST ")]
        assert lines, p.stderr[-2000:]
        digests.append(lines[-1])
    assert digests[0] == digests[1]
