"""Batch-serve registrations from an AOT artifact over a case directory.

The serving counterpart to ``tools/export_serving.py``: loads one
``.liftreg`` artifact (program + weights; ``liftreg_tpu/serving.py``) and
registers every case found in ``--input``, batching up to the artifact's
exported batch size per dispatch::

    python tools/serve_batch.py -a flagship.liftreg \
        -i /data/cases -o /data/out

Case layout: ``<id>_source.npy`` + ``<id>_target.npy`` HU volumes
(D, W, H) or (1, D, W, H), with optional ``<id>_source_seg.npy`` /
``<id>_target_seg.npy`` masks. For a CT-free artifact
(``--entry projections`` at export) the target is
``<id>_target_proj.npy`` — (P, pw, ph) normalized projections — and no
target volume or target seg is read. Outputs ``<id>_warped.npy`` and
``<id>_phi.npy`` — phis rescaled to [0, 1] like every other ``_phi.npy``
in this repo (``io_utils.save_deformations``), so an output directory is
directly scoreable by the TRE evaluator (``utils/tre.eval_copd_highres``
reads ``<exp>/tests``).

The reference has no serving entry point at all — deployment means
re-running its eval stack from source (``eval.py:35-49``).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def find_cases(input_dir, target_suffix="_target.npy"):
    ids = sorted(
        f[:-len("_source.npy")] for f in os.listdir(input_dir)
        if f.endswith("_source.npy"))
    return [i for i in ids
            if os.path.exists(os.path.join(input_dir, i + target_suffix))]


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-a", "--artifact", required=True)
    ap.add_argument("-i", "--input", required=True,
                    help="directory of <id>_source.npy / <id>_target.npy")
    ap.add_argument("-o", "--out", required=True)
    args = ap.parse_args()

    import numpy as np

    from liftreg_tpu.serving import ServingModel

    srv = ServingModel.load(args.artifact)
    sz = tuple(srv.img_sz)
    os.makedirs(args.out, exist_ok=True)

    def load_vol(path):
        v = np.load(path).astype(np.float32)
        if v.ndim == 3:
            v = v[None]
        if v.shape[-3:] != sz:
            raise ValueError(f"{path}: shape {v.shape[-3:]} != artifact "
                             f"img_sz {sz}")
        return v  # (1, D, W, H)

    # CT-free artifacts consume <id>_target_proj.npy ((P, pw, ph)
    # normalized projections) instead of a target volume
    ct_free = srv.entry == "register_projections"
    target_suffix = "_target_proj.npy" if ct_free else "_target.npy"
    ids = find_cases(args.input, target_suffix)
    if not ids:
        print(f"no cases found in {args.input} "
              f"(need <id>_source.npy + <id>{target_suffix})",
              file=sys.stderr)
        sys.exit(1)
    print(f"{len(ids)} case(s), artifact batch {srv.batch_size}, "
          f"entry {srv.entry}, platforms {list(srv.platforms)}")

    done = 0
    for start in range(0, len(ids), srv.batch_size):
        chunk = ids[start:start + srv.batch_size]
        src = np.stack([load_vol(os.path.join(args.input, i + "_source.npy"))
                        for i in chunk])

        def seg_or_ones(i, which):
            p = os.path.join(args.input, f"{i}_{which}_seg.npy")
            return load_vol(p) if os.path.exists(p) \
                else np.ones((1,) + sz, np.float32)

        sseg = np.stack([seg_or_ones(i, "source") for i in chunk])
        if ct_free:
            proj = np.stack([np.load(os.path.join(
                args.input, i + target_suffix)).astype(np.float32)
                for i in chunk])
            warped, phi = srv.register_projections(src, proj, sseg)
        else:
            tgt = np.stack([load_vol(os.path.join(args.input,
                                                  i + target_suffix))
                            for i in chunk])
            tseg = np.stack([seg_or_ones(i, "target") for i in chunk])
            warped, phi = srv.register(src, tgt, sseg, tseg)
        warped, phi = np.asarray(warped), np.asarray(phi)
        # repo-wide _phi.npy convention: [0, 1] (save_deformations)
        phi = (phi + 1.0) / 2.0
        for k, cid in enumerate(chunk):
            np.save(os.path.join(args.out, cid + "_warped.npy"), warped[k])
            np.save(os.path.join(args.out, cid + "_phi.npy"), phi[k])
            done += 1
        print(f"  [{done}/{len(ids)}] {', '.join(chunk)}")
    print(f"wrote {done} registrations to {args.out}")


if __name__ == "__main__":
    main()
