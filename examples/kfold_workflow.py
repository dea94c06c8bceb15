"""K-fold cross-validation workflow — the shape of the reference's Boston
housing example (``examples/bigKRLS_boston_kcv.md``: 5 folds, seed 1234,
out-of-sample R² / MSE per fold, then a full-data fit with inference and
persistence).  Uses a synthetic nonlinear regression of the same size
(N≈506, P=13) since the Boston dataset isn't redistributable here.

Run:  python examples/kfold_workflow.py
"""
import numpy as np

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))  # run from a repo checkout


import bigkrls_tpu as bk

rng = np.random.default_rng(1234)
N, P = 506, 13
X = rng.normal(size=(N, P))
X[:, 3] = (X[:, 3] > 0).astype(float)        # a "chas"-like dummy
beta = rng.normal(size=P)
y = X @ beta + 2 * np.sin(X[:, 0]) + X[:, 1] * X[:, 2] \
    + 0.8 * rng.normal(size=N)

cv = bk.crossvalidate(y, X, seed=1234, kfolds=5, noisy=False)
report = bk.summary_cv(cv)
print(report["text"])
print("\nper-fold out-of-sample R²:", np.round(cv.metrics["R2_oos"], 3))

model = bk.fit(y, X, noisy=False)
print(bk.summary(model))

folder = bk.save_model(model, "kfold_workflow_model",
                       overwrite_existing=True)
reloaded = bk.load_model(folder)
assert np.allclose(reloaded.coeffs, model.coeffs)
print(f"\nmodel saved to and reloaded from {folder}/")
