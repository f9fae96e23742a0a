"""Convert a serving artifact between formats (v1 msgpack <-> v2 zero-copy).

v2 (the default export format since round 3) mmaps its weight sections, so
a multi-GB artifact opens in milliseconds instead of decoding the whole
file; upgrade round-2 v1 artifacts with::

    python tools/convert_artifact.py old_v1.liftreg new_v2.liftreg
    python tools/convert_artifact.py --to 1 v2.liftreg legacy_v1.liftreg

Pure host-side IO — no device, no re-export; the AOT program bytes and
weights are carried over verbatim.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--to", type=int, choices=(1, 2), default=2)
    args = ap.parse_args()

    # no device needed: force CPU before the axon plugin can hang on a
    # dead tunnel (read_artifact itself never touches jax devices, but
    # importing liftreg_tpu pulls in jax)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from flax import serialization

    from liftreg_tpu.serving import _write_v2, read_artifact

    t0 = time.time()
    payload = read_artifact(args.src)
    print(f"read {args.src} (v{payload['version']}) in {time.time()-t0:.1f}s")
    payload = dict(payload)
    payload["version"] = args.to
    t0 = time.time()
    if args.to == 2:
        _write_v2(payload, args.dst)
    else:
        # v1: materialize mmap views (msgpack can't serialize read-only
        # buffer views in_place) and write the single blob
        payload["params"] = jax.tree_util.tree_map(
            np.array, payload["params"])
        payload["pca"] = jax.tree_util.tree_map(np.array, payload["pca"])
        payload["exported"] = bytes(payload["exported"])
        blob = serialization.msgpack_serialize(payload)
        tmp = args.dst + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, args.dst)
    sz = os.path.getsize(args.dst) / 1e9
    print(f"wrote {args.dst} (v{args.to}, {sz:.2f} GB) "
          f"in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
