"""Uncertainty quantification for active-learning structure selection.

Re-design of mcmc/uncertainty/uncertainty.py (532 LoC, torch) without
torch: ensemble-variance and GMM-NLL uncertainties with conformal-
prediction calibration. Scoring paths are JAX (device-friendly, batched);
GMM fitting uses sklearn on the host (one-time, small), with the scoring
parameters (cholesky precisions) exported to device arrays — the same
split the reference makes between sklearn fit and torch log-prob
(uncertainty.py:295, 344-400).
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

ORDERS = (
    "atomic",
    "system_sum",
    "system_mean",
    "system_max",
    "system_min",
    "system_mean_squared",
    "system_root_mean_squared",
)


def reduce_order(values: np.ndarray | jnp.ndarray, order: str, axis=-1):
    """Per-system reduction of per-atom values (uncertainty.py orders)."""
    if order == "atomic":
        return values
    if order == "system_sum":
        return values.sum(axis)
    if order == "system_mean":
        return values.mean(axis)
    if order == "system_max":
        return values.max(axis)
    if order == "system_min":
        return values.min(axis)
    if order == "system_mean_squared":
        return (values**2).mean(axis)
    if order == "system_root_mean_squared":
        return np.sqrt((values**2).mean(axis)) if isinstance(values, np.ndarray) else jnp.sqrt(
            (values**2).mean(axis)
        )
    raise ValueError(f"unknown order {order!r}")


@dataclass
class ConformalPrediction:
    """Quantile calibration of a heuristic uncertainty (amptorch scheme,
    uncertainty.py:113-141): qhat = Q_{ceil((n+1)(1-a))/n}(|res|/unc)."""

    alpha: float = 0.05
    qhat: float | None = None

    def fit(self, residuals: np.ndarray, heuristic_uncertainty: np.ndarray) -> None:
        scores = np.abs(np.asarray(residuals) / np.asarray(heuristic_uncertainty))
        n = len(scores)
        q = min(np.ceil((n + 1) * (1 - self.alpha)) / n, 1.0)
        self.qhat = float(np.quantile(scores, q, method="linear"))

    def predict(self, heuristic_uncertainty):
        if self.qhat is None:
            raise RuntimeError("ConformalPrediction not fitted")
        return heuristic_uncertainty * self.qhat, self.qhat


@dataclass
class Uncertainty:
    """Base: order reduction + optional min-uncertainty shift + CP scaling."""

    order: str = "atomic"
    calibrate: bool = False
    cp_alpha: float = 0.05
    min_uncertainty: float | None = None
    cp: ConformalPrediction = field(default=None)

    def __post_init__(self):
        assert self.order in ORDERS, f"{self.order} not implemented"
        if self.calibrate and self.cp is None:
            self.cp = ConformalPrediction(alpha=self.cp_alpha)

    def scale_to_min_uncertainty(self, u):
        if self.min_uncertainty is not None:
            shift = (
                self.min_uncertainty**2
                if self.order == "system_mean_squared"
                else self.min_uncertainty
            )
            u = u - shift
        return u

    def fit_conformal_prediction(self, residuals, heuristic_uncertainty) -> None:
        self.cp.fit(residuals, heuristic_uncertainty)

    def calibrate_uncertainty(self, u):
        out, _ = self.cp.predict(u)
        return out

    def finalize(self, u):
        u = self.scale_to_min_uncertainty(u)
        if self.calibrate and self.cp is not None and self.cp.qhat is not None:
            u = self.calibrate_uncertainty(u)
        return u

    def __call__(self, *a, **kw):
        return self.get_uncertainty(*a, **kw)

    # persistence (uncertainty.py:90-110)
    def save(self, path) -> None:
        with open(path, "wb") as f:
            pickle.dump(self, f)

    @staticmethod
    def load(path) -> "Uncertainty":
        with open(path, "rb") as f:
            return pickle.load(f)


@dataclass
class EnsembleUncertainty(Uncertainty):
    """Std/variance across NN-ensemble members (uncertainty.py:144-235).

    quantity: 'energy' (std of member energies) or 'forces' (per-atom norm
    of member force std, reduced by ``order``).
    """

    quantity: str = "forces"

    def get_uncertainty(self, member_energy=None, forces_std=None):
        if self.quantity == "energy":
            u = jnp.std(member_energy)
        else:
            u = jnp.linalg.norm(forces_std, axis=-1)   # (N,)
            u = reduce_order(u, self.order)
        return self.finalize(u)


@dataclass
class GMMUncertainty(Uncertainty):
    """Negative log-likelihood under a GMM fit on training embeddings
    (uncertainty.py:238-456 + the vendored gmm.py). Fit on host (sklearn);
    score on device from exported (means, cholesky precisions, weights)."""

    n_components: int = 8
    covariance_type: str = "full"
    gmm_params: dict | None = None

    def fit_gmm(self, train_embeddings: np.ndarray, random_state: int = 0,
                method: str = "sklearn", **em_kwargs) -> None:
        """Fit the mixture. ``method="sklearn"``: host fit (small data).
        ``method="em"``: the chunked-EM JAX fit (``fit_gmm_em``) — the
        TPU-native replacement for the reference's vendored huge-matrix
        GaussianMixture (gmm.py:27,427-781), for embedding matrices too
        large to fit densely."""
        if method == "em":
            self.gmm_params = fit_gmm_em(
                np.asarray(train_embeddings), self.n_components,
                seed=random_state, **em_kwargs)
            return
        from sklearn.mixture import GaussianMixture

        gm = GaussianMixture(
            n_components=self.n_components,
            covariance_type=self.covariance_type,
            random_state=random_state,
        ).fit(np.asarray(train_embeddings))
        self.gmm_params = {
            "means": gm.means_,
            "precisions_cholesky": gm.precisions_cholesky_,
            "weights": gm.weights_,
        }

    def log_prob(self, x):
        """Batched GMM log-likelihood in JAX (device-side scoring)."""
        p = self.gmm_params
        mu = jnp.asarray(p["means"])                     # (C, D)
        prec_chol = jnp.asarray(p["precisions_cholesky"])  # (C, D, D)
        w = jnp.asarray(p["weights"])                    # (C,)
        x = jnp.atleast_2d(jnp.asarray(x))               # (B, D)
        d = x.shape[-1]
        # y = (x - mu) @ prec_chol  per component
        y = jnp.einsum("bd,cde->bce", x, prec_chol) - jnp.einsum(
            "cd,cde->ce", mu, prec_chol
        )[None]
        maha = jnp.sum(y * y, axis=-1)                   # (B, C)
        logdet = jnp.sum(
            jnp.log(jnp.abs(jnp.diagonal(prec_chol, axis1=-2, axis2=-1))), axis=-1
        )                                                # (C,)
        logp = -0.5 * (d * jnp.log(2 * jnp.pi) + maha) + logdet[None]
        from jax.scipy.special import logsumexp

        return logsumexp(logp + jnp.log(w)[None], axis=-1)  # (B,)

    def get_uncertainty(self, embeddings):
        """embeddings: (N_atoms, D) per-atom (or (B, D) per-structure)."""
        if self.gmm_params is None:
            raise RuntimeError("GMMUncertainty: call fit_gmm first")
        nll = -self.log_prob(embeddings)
        u = reduce_order(nll, self.order) if self.order != "atomic" else nll
        return self.finalize(u)

    def _n_parameters(self, d: int) -> int:
        """Free parameters of a full-covariance GMM (gmm.py bic/aic)."""
        cov = self.n_components * d * (d + 1) // 2
        return int(cov + self.n_components * d + self.n_components - 1)

    def bic(self, x) -> float:
        """Bayesian information criterion (vendored gmm.py:739 analog)."""
        import numpy as _np

        x = _np.atleast_2d(_np.asarray(x))
        ll = float(_np.asarray(self.log_prob(x)).mean())
        return -2.0 * ll * len(x) + self._n_parameters(x.shape[1]) * _np.log(len(x))

    def aic(self, x) -> float:
        """Akaike information criterion (vendored gmm.py:755 analog)."""
        import numpy as _np

        x = _np.atleast_2d(_np.asarray(x))
        ll = float(_np.asarray(self.log_prob(x)).mean())
        return -2.0 * ll * len(x) + 2.0 * self._n_parameters(x.shape[1])


def fit_gmm_em(x: np.ndarray, n_components: int, n_iter: int = 60,
               chunk: int = 4096, reg_covar: float = 1e-6, seed: int = 0,
               tol: float = 1e-4) -> dict:
    """Full-covariance GMM EM with CHUNKED sufficient statistics.

    TPU-native replacement for the reference's vendored GaussianMixture
    whose ``batched_dot_product`` exists to score huge embedding matrices
    without materializing (N, C, D) temporaries (mcmc/uncertainty/
    gmm.py:27-60,427-781). Here both EM phases stream over row chunks
    with ``lax.map``: the E-step computes chunk responsibilities from the
    current cholesky precisions, the M-step accumulates (Nk, r^T X,
    per-component weighted scatter) — peak memory is O(chunk * C + C *
    D^2) regardless of N. Returns {means, precisions_cholesky, weights}
    in the exact sklearn parameterization ``GMMUncertainty.log_prob``
    consumes, so fitting and scoring stay interchangeable with the
    sklearn path.

    Init: means from k-means++-style farthest-point draws, shared
    diagonal data covariance, uniform weights. Fixed ``n_iter`` sweeps
    with an early-stop on mean log-likelihood change < ``tol``.
    """
    import jax
    from jax.scipy.special import logsumexp

    x = np.asarray(x, np.float64)
    # center globally in f64 BEFORE the f32 device pass: the covariance
    # update E[xx^T] - mu mu^T cancels catastrophically when embedding
    # magnitudes dwarf their spread (typical NN latents); removing the
    # common offset keeps the cancellation at cluster-separation scale.
    # Covariances are translation-invariant; the offset is added back to
    # the returned means.
    x_center = x.mean(axis=0)
    x = x - x_center
    n, d = x.shape
    c = n_components
    rng = np.random.default_rng(seed)

    # --- init: farthest-point means, shared diagonal covariance
    means = [x[rng.integers(n)]]
    for _ in range(c - 1):
        d2 = np.min(
            [np.sum((x - m) ** 2, axis=1) for m in means], axis=0)
        p = d2 / max(d2.sum(), 1e-300)
        means.append(x[rng.choice(n, p=p)])
    mu0 = np.stack(means)                                   # (C, D)
    var0 = np.maximum(x.var(axis=0), reg_covar)             # (D,)
    cov0 = np.broadcast_to(np.diag(var0), (c, d, d)).copy()

    # pad rows to a chunk multiple; dummy rows carry weight 0
    n_pad = (-n) % chunk
    xp = np.concatenate([x, np.zeros((n_pad, d))]) if n_pad else x
    row_w = np.concatenate([np.ones(n), np.zeros(n_pad)]) if n_pad else np.ones(n)
    xc = jnp.asarray(xp.reshape(-1, chunk, d))              # (S, chunk, D)
    wc = jnp.asarray(row_w.reshape(-1, chunk))              # (S, chunk)

    def prec_chol_of(cov):
        # sklearn's parameterization: solve L y = I with L = chol(cov),
        # precisions_cholesky = y^T (upper triangular)
        L = jnp.linalg.cholesky(cov)
        eye = jnp.eye(d, dtype=cov.dtype)
        y = jax.vmap(lambda Li: jax.scipy.linalg.solve_triangular(
            Li, eye, lower=True))(L)
        return jnp.swapaxes(y, -1, -2)

    def log_prob_chunk(xb, mu, pch, logw):
        y = jnp.einsum("bd,cde->bce", xb, pch) - jnp.einsum(
            "cd,cde->ce", mu, pch)[None]
        maha = jnp.sum(y * y, axis=-1)
        logdet = jnp.sum(jnp.log(jnp.abs(
            jnp.diagonal(pch, axis1=-2, axis2=-1))), axis=-1)
        return -0.5 * (d * jnp.log(2 * jnp.pi) + maha) + logdet[None] + logw[None]

    @jax.jit
    def em_step(mu, cov, w):
        pch = prec_chol_of(cov)
        logw = jnp.log(w)

        def stats(carry, inp):
            xb, wb = inp
            lp = log_prob_chunk(xb, mu, pch, logw)          # (chunk, C)
            ll_rows = logsumexp(lp, axis=-1)
            r = jnp.exp(lp - ll_rows[:, None]) * wb[:, None]
            nk = r.sum(0)                                   # (C,)
            sx = r.T @ xb                                   # (C, D)
            sxx = jnp.einsum("bc,bd,be->cde", r, xb, xb)    # (C, D, D)
            ll = jnp.sum(ll_rows * wb)
            a_nk, a_sx, a_sxx, a_ll = carry
            return (a_nk + nk, a_sx + sx, a_sxx + sxx, a_ll + ll), None

        init = (jnp.zeros(c), jnp.zeros((c, d)), jnp.zeros((c, d, d)), 0.0)
        (nk, sx, sxx, ll), _ = jax.lax.scan(stats, init, (xc, wc))
        nk = jnp.maximum(nk, 1e-10)
        mu_new = sx / nk[:, None]
        cov_new = sxx / nk[:, None, None] - jnp.einsum(
            "cd,ce->cde", mu_new, mu_new)
        cov_new = cov_new + reg_covar * jnp.eye(d)[None]
        w_new = nk / nk.sum()
        return mu_new, cov_new, w_new, ll / n

    mu, cov, w = jnp.asarray(mu0), jnp.asarray(cov0), jnp.full(c, 1.0 / c)
    prev_ll = -np.inf
    for _ in range(n_iter):
        mu, cov, w, ll = em_step(mu, cov, w)
        ll = float(ll)
        if abs(ll - prev_ll) < tol:
            break
        prev_ll = ll
    return {
        "means": np.asarray(mu) + x_center,
        "precisions_cholesky": np.asarray(prec_chol_of(cov)),
        "weights": np.asarray(w),
    }


UNC_DICT = {"ensemble": EnsembleUncertainty, "gmm": GMMUncertainty}


def get_unc_class(name: str, **kwargs) -> Uncertainty:
    """Factory mirroring uncertainty.py:458-532."""
    return UNC_DICT[name](**kwargs)
