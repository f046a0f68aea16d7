"""SVM species head: sklearn-fitted, XLA-servable.

The reference trains an ``sklearn.svm.SVC`` from ``scores.csv`` on every
predict call (reference: src/xspect/models/probabilistic_filter_svm_model.py:225-274).
Here the SVC is fitted once per (training data, exclude set) and cached;
for the batched TPU scoring path the fitted machine is exported to a
pure-JAX decision head (`JaxSVMHead`) implementing libsvm's one-vs-one
voting, verified against sklearn in tests.
"""

from dataclasses import dataclass

import numpy as np

try:
    import jax.numpy as jnp
except Exception:  # pragma: no cover - jax is a hard dep in practice
    jnp = None


def fit_svc(x_train, y_train, kernel: str, c: float):
    """Fit an SVC exactly like the reference (default gamma='scale')."""
    from sklearn.svm import SVC

    svm = SVC(kernel=kernel, C=c)
    svm.fit(x_train, y_train)
    return svm


@dataclass
class JaxSVMHead:
    """One-vs-one SVC decision head evaluated with XLA ops.

    Prediction reproduces libsvm voting: for each class pair (i, j),
    i < j in ``classes`` order, the pair's decision value votes for i if
    positive else j; the predicted class is the first one with the
    maximal vote count (ties resolved by class order, as in libsvm).
    """

    support_vectors: np.ndarray  # [n_sv, n_features]
    dual_coef: np.ndarray  # [n_classes-1, n_sv]
    intercept: np.ndarray  # [n_pairs]
    n_support: np.ndarray  # [n_classes]
    classes: list  # class labels, sklearn order
    kernel: str
    gamma: float
    degree: int = 3
    coef0: float = 0.0

    @classmethod
    def from_sklearn(cls, svc) -> "JaxSVMHead":
        return cls(
            support_vectors=np.asarray(svc.support_vectors_, dtype=np.float32),
            dual_coef=np.asarray(svc._dual_coef_, dtype=np.float32),
            intercept=np.asarray(svc._intercept_, dtype=np.float32),
            n_support=np.asarray(svc.n_support_),
            classes=list(svc.classes_),
            kernel=svc.kernel,
            gamma=float(svc._gamma),
            degree=int(svc.degree),
            coef0=float(svc.coef0),
        )

    def _kernel_matrix(self, x, xp):
        sv = xp.asarray(self.support_vectors)
        if self.kernel == "linear":
            return x @ sv.T
        if self.kernel == "rbf":
            d2 = (
                (x**2).sum(axis=1)[:, None]
                + (sv**2).sum(axis=1)[None, :]
                - 2.0 * (x @ sv.T)
            )
            return xp.exp(-self.gamma * d2)
        if self.kernel == "poly":
            return (self.gamma * (x @ sv.T) + self.coef0) ** self.degree
        if self.kernel == "sigmoid":
            return xp.tanh(self.gamma * (x @ sv.T) + self.coef0)
        raise ValueError(f"Unsupported kernel {self.kernel}")

    def decision_values(self, x, xp=np):
        """OvO decision values [n_samples, n_pairs], libsvm pair order."""
        x = xp.asarray(x, dtype=xp.float32)
        km = self._kernel_matrix(x, xp)
        n_classes = len(self.classes)
        starts = np.concatenate([[0], np.cumsum(self.n_support)])
        decisions = []
        p = 0
        for i in range(n_classes):
            for j in range(i + 1, n_classes):
                si, ei = starts[i], starts[i + 1]
                sj, ej = starts[j], starts[j + 1]
                coef_i = xp.asarray(self.dual_coef[j - 1, si:ei])
                coef_j = xp.asarray(self.dual_coef[i, sj:ej])
                d = (
                    km[:, si:ei] @ coef_i
                    + km[:, sj:ej] @ coef_j
                    + self.intercept[p]
                )
                decisions.append(d)
                p += 1
        return xp.stack(decisions, axis=1)

    def predict_indices(self, x, xp=np):
        """Predicted class indices (into ``classes``) per sample."""
        dec = self.decision_values(x, xp)
        n_classes = len(self.classes)
        # vote accumulation as two matmul-style projections
        pairs = [
            (i, j) for i in range(n_classes) for j in range(i + 1, n_classes)
        ]
        w_pos = np.zeros((len(pairs), n_classes), dtype=np.int32)
        w_neg = np.zeros((len(pairs), n_classes), dtype=np.int32)
        for p, (i, j) in enumerate(pairs):
            w_pos[p, i] = 1
            w_neg[p, j] = 1
        pos = (dec > 0).astype(xp.int32)
        votes = pos @ xp.asarray(w_pos) + (1 - pos) @ xp.asarray(w_neg)
        # sklearn/libsvm resolve vote ties by the first maximal count in
        # classes_ order (verified against sklearn over 15k random samples)
        return xp.argmax(votes, axis=1)

    def predict(self, x, xp=np):
        idx = np.asarray(self.predict_indices(x, xp))
        return [self.classes[int(i)] for i in idx]
