"""Subprocess body for ``test_smrf_exact_bitmatch_all_isprs``.

Run as ``python -m tests._exact_bitmatch_runner <sample>`` from the
repo root; prints one JSON verdict line.  The check runs in its OWN
process because three full-suite runs segfaulted inside an XLA CPU
compile of the f64 ``_smrf_exact`` program after hundreds of prior
compiles in the same process (jax 0.9.0 CPU backend state accumulation
— the identical test passes in a fresh interpreter; raising the stack
rlimit did not help).
"""

import json
import sys


def main(sample):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import pandas as pd

    from tests.conftest import isprs_path
    from tests.reference_impls import np_smrf
    from neilpy_tpu.pipelines.smrf import smrf

    fn = isprs_path(f"samp{sample}.txt")
    df = pd.read_csv(fn, header=None, names=["x", "y", "z", "g"],
                     delimiter="\t")
    ref_pts, ref_obj, margin = np_smrf(df.x, df.y, df.z, 1, 18, .15, .5,
                                       1.25, return_margin=True)
    _, _, ex_obj, ex_pts = smrf(df.x, df.y, df.z, 1, 18, .15, .5, 1.25,
                                precision="exact")
    diff = np.asarray(ex_obj) != ref_obj
    n_diff = int(diff.sum())
    print(json.dumps({
        "pts_equal": bool(np.array_equal(np.asarray(ex_pts), ref_pts)),
        "n_diff": n_diff,
        "max_margin": float(margin[diff].max()) if n_diff else 0.0,
    }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]))
