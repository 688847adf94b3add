"""Full ISPRS 15-sample SMRF regression — the reference's own accuracy
harness (test_neilpy.py:62-79) with the published 'best overall'
parameters (windows=18, cellsize=1, .15/.5/1.25).

The paper (Pingel, Clarke & McBride 2013) reports ~2.97% mean total
error across the samples.  Marked slow: ~4 min on the CPU backend.
"""

import glob
import os

import numpy as np
import pandas as pd
import pytest

from neilpy_tpu.pipelines.smrf import smrf
from .conftest import ISPRS_DIR

SAMPLES = sorted(glob.glob(os.path.join(ISPRS_DIR, "samp*.txt")))


@pytest.mark.slow
@pytest.mark.skipif(not SAMPLES, reason="ISPRS data not mounted")
def test_all_samples_mean_error():
    errors = {}
    for fn in SAMPLES:
        df = pd.read_csv(fn, header=None, names=["x", "y", "z", "g"],
                         delimiter="\t")
        _, _, _, pts = smrf(df.x, df.y, df.z, 1, 18, .15, .5, 1.25)
        pts = np.asarray(pts)
        errors[os.path.basename(fn)] = 1 - np.mean(pts == df.g)
    mean_err = float(np.mean(list(errors.values())))
    median_err = float(np.median(list(errors.values())))
    print({k: round(100 * v, 3) for k, v in errors.items()})
    print(f"mean {100 * mean_err:.3f}%  median {100 * median_err:.3f}%")
    # With the single published "best overall" parameter set the f64
    # reference pipeline measures mean 4.39% / median 3.46% on these
    # 15 samples (the paper's ~2.97% used per-sample tuning); we must
    # stay within f32 decision-margin noise of that.
    assert mean_err < 0.0444, errors
    assert median_err < 0.0352, errors
    assert errors["samp12.txt"] < 0.0312
