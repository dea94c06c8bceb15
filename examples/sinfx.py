"""sinfx — the reference's canonical demo (``examples/sinfx.Rmd``):
y = sin(x1) + noise with an irrelevant x2; KRLS recovers the pointwise
derivative cos(x1) while a linear model would report a near-zero slope.

Run:  python examples/sinfx.py
"""
import numpy as np

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))  # run from a repo checkout


import bigkrls_tpu as bk

rng = np.random.default_rng(2025)
N = 2000
x1 = rng.uniform(-np.pi, np.pi, size=N)
x2 = rng.normal(size=N)
y = np.sin(x1) + 0.2 * rng.normal(size=N)
X = np.stack([x1, x2], axis=1)

model = bk.fit(y, X, xlabs=["x1", "x2"], noisy=True)
print(bk.summary(model))

corr = np.corrcoef(model.derivatives[:, 0], np.cos(x1))[0, 1]
print(f"\ncor(dy/dx1, cos(x1)) = {corr:.4f}   (should be ~1)")

out = bk.plot_effects(model, save_to="sinfx_effects.png")
print(f"effects plot written to {out}")
