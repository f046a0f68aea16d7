"""SVM hyper-parameter evaluation over scores.csv.

The reference sweeps SVC kernels offline in a Nextflow pipeline
(reference: scripts/score-svm/main.nf:140, SVC training on score
tables).  Here the sweep is a leave-one-out grid search over the model's
persisted ``scores.csv``.
"""

from itertools import product

import numpy as np


def grid_search_svm(
    x: np.ndarray,
    y: list[str],
    kernels: tuple[str, ...] = ("linear", "rbf", "poly", "sigmoid"),
    cs: tuple[float, ...] = (0.1, 1.0, 10.0),
) -> list[dict]:
    """Leave-one-out accuracy for each (kernel, C); best first."""
    from sklearn.svm import SVC

    x = np.asarray(x, dtype=float)
    y = np.asarray(y)
    n = len(y)
    results = []
    for kernel, c in product(kernels, cs):
        correct = 0
        for i in range(n):
            mask = np.arange(n) != i
            if len(set(y[mask])) < 2:
                continue
            svm = SVC(kernel=kernel, C=c)
            svm.fit(x[mask], y[mask])
            correct += int(svm.predict(x[i : i + 1])[0] == y[i])
        results.append(
            {"kernel": kernel, "C": c, "loo_accuracy": correct / n if n else 0.0}
        )
    results.sort(key=lambda r: -r["loo_accuracy"])
    return results


def grid_search_model(model, kernels=("linear", "rbf"), cs=(0.1, 1.0, 10.0)):
    """Grid search over a trained SVM model's persisted scores.csv."""
    x, y = model._read_training_scores(None)
    return grid_search_svm(np.asarray(x), y, kernels=kernels, cs=cs)
