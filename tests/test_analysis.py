"""Tests for uncertainty and clustering analysis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surface_sampling_tpu.analysis import (
    ConformalPrediction,
    EnsembleUncertainty,
    GMMUncertainty,
    Uncertainty,
    find_closest_points_indices,
    get_cluster_centers,
    pca_whiten,
    perform_clustering,
    reduce_order,
    select_representatives,
)


def test_reduce_orders():
    v = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    assert np.allclose(reduce_order(v, "system_sum"), [6, 15])
    assert np.allclose(reduce_order(v, "system_mean"), [2, 5])
    assert np.allclose(reduce_order(v, "system_max"), [3, 6])
    assert np.allclose(reduce_order(v, "system_min"), [1, 4])
    assert np.allclose(reduce_order(v, "system_mean_squared"), [14 / 3, 77 / 3])
    assert np.allclose(
        reduce_order(v, "system_root_mean_squared"), np.sqrt([14 / 3, 77 / 3])
    )


def test_conformal_prediction_calibration():
    rng = np.random.default_rng(0)
    unc = rng.uniform(0.5, 2.0, 1000)
    resid = unc * rng.normal(0, 1.0, 1000)   # residual ~ unc * N(0,1)
    cp = ConformalPrediction(alpha=0.05)
    cp.fit(resid, unc)
    # qhat should be close to the 95% quantile of |N(0,1)| ~ 1.96
    assert 1.7 < cp.qhat < 2.3
    scaled, qhat = cp.predict(unc)
    # ~95% of residuals covered by the calibrated bound
    coverage = np.mean(np.abs(resid) <= scaled)
    assert coverage > 0.9


def test_ensemble_uncertainty():
    eu = EnsembleUncertainty(order="system_mean", quantity="forces")
    fstd = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (10, 3)))
    u = eu.get_uncertainty(forces_std=fstd)
    assert np.isfinite(float(u))
    eu_e = EnsembleUncertainty(order="system_mean", quantity="energy")
    u_e = eu_e.get_uncertainty(member_energy=jnp.asarray([1.0, 2.0, 3.0]))
    assert np.isclose(float(u_e), np.std([1, 2, 3]))


def test_gmm_uncertainty_separates_ood():
    rng = np.random.default_rng(1)
    train = rng.normal(0, 1.0, (500, 8))
    gu = GMMUncertainty(order="atomic", n_components=4)
    gu.fit_gmm(train)
    in_dist = rng.normal(0, 1.0, (50, 8))
    ood = rng.normal(8.0, 1.0, (50, 8))
    nll_in = np.asarray(gu.get_uncertainty(in_dist))
    nll_out = np.asarray(gu.get_uncertainty(ood))
    assert nll_out.mean() > nll_in.mean() + 10


def test_gmm_log_prob_matches_sklearn():
    from sklearn.mixture import GaussianMixture

    rng = np.random.default_rng(2)
    X = np.concatenate([rng.normal(0, 1, (200, 4)), rng.normal(4, 0.5, (200, 4))])
    gu = GMMUncertainty(n_components=2)
    gu.fit_gmm(X)
    gm = GaussianMixture(n_components=2, random_state=0).fit(X)
    test = rng.normal(1, 2, (20, 4))
    ours = np.asarray(gu.log_prob(test))
    theirs = gm.score_samples(test)
    assert np.allclose(ours, theirs, atol=1e-4)


def test_uncertainty_save_load(tmp_path):
    eu = EnsembleUncertainty(order="system_max", calibrate=True)
    eu.fit_conformal_prediction(np.array([1.0, 2, 1.5]), np.array([1.0, 1, 1]))
    p = tmp_path / "unc.pkl"
    eu.save(p)
    back = Uncertainty.load(p)
    assert back.order == "system_max"
    assert back.cp.qhat == eu.cp.qhat


def test_pca_and_clustering_pipeline():
    rng = np.random.default_rng(3)
    # four blobs whose centers span a 3-d subspace (the whitened top-3 PCs
    # the pipeline clusters on), separation >> isotropic noise
    centers = np.zeros((4, 64))
    centers[1, 0] = 50.0
    centers[2, 1] = 50.0
    centers[3, 2] = 50.0
    blobs = [c + rng.normal(0, 1.0, (30, 64)) for c in centers]
    X = np.concatenate(blobs)
    labels = perform_clustering(X, clustering_cutoff=4, cutoff_criterion="maxclust")
    assert len(np.unique(labels)) == 4
    # blob members share labels
    for i in range(4):
        seg = labels[i * 30 : (i + 1) * 30]
        assert len(np.unique(seg)) == 1
    # distance criterion also works
    labels_d = perform_clustering(X, clustering_cutoff=5.0, cutoff_criterion="distance")
    assert len(np.unique(labels_d)) >= 4


def test_select_representatives():
    labels = np.array([1, 1, 2, 2, 3])
    metric = np.array([0.1, 0.9, 0.5, 0.2, 0.7])
    idx = select_representatives(labels, metric, metric="force_std")
    assert idx.tolist() == [1, 2, 4]
    idx_r = select_representatives(labels, metric, metric="random",
                                   rng=np.random.default_rng(0))
    assert len(idx_r) == 3


def test_cluster_centers_for_even_adsorption():
    pts = np.array([[0, 0], [0.1, 0], [5, 5], [5.1, 5], [10, 0], [10, 0.1]])
    centers, labels = get_cluster_centers(pts, 3)
    assert centers.shape == (3, 2)
    idx = find_closest_points_indices(pts, centers, labels)
    assert len(np.unique(idx)) == 3


def test_statistics_module():
    from surface_sampling_tpu.analysis.statistics import (
        autocorrelation,
        compare_distributions,
        distribution_summary,
        effective_sample_size,
        integrated_autocorrelation_time,
        pooled_chain_energies,
    )

    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, 4000)
    b = rng.normal(0.05, 1, 4000)
    c = rng.normal(3.0, 1, 4000)

    s = distribution_summary(a)
    assert abs(s["mean"]) < 0.1 and abs(s["std"] - 1) < 0.1
    near = compare_distributions(a, b)
    far = compare_distributions(a, c)
    assert far["wasserstein"] > 10 * near["wasserstein"]
    assert far["ks_stat"] > near["ks_stat"]

    # iid series: tau ~ 1; AR(1) with phi=0.9: tau ~ (1+phi)/(1-phi) = 19
    assert integrated_autocorrelation_time(a) < 3
    x = np.zeros(20000)
    for i in range(1, len(x)):
        x[i] = 0.9 * x[i - 1] + rng.normal()
    tau = integrated_autocorrelation_time(x)
    assert 8 < tau < 40
    assert effective_sample_size(x) < len(x) / 5

    acf = autocorrelation(a, max_lag=10)
    assert np.isclose(acf[0], 1.0)

    pooled = pooled_chain_energies(np.arange(40).reshape(4, 10))
    assert pooled.shape == (20,)


def test_gmm_em_fit_matches_sklearn_quality():
    """The chunked-EM JAX fit (fit_gmm_em — the TPU-native stand-in for
    the reference's vendored huge-matrix GaussianMixture, gmm.py:427-781)
    must (a) be invariant to the chunk size (streamed sufficient
    statistics == dense), (b) recover well-separated cluster means, and
    (c) reach sklearn-fit log-likelihood on the same data."""
    from sklearn.mixture import GaussianMixture

    from surface_sampling_tpu.analysis.uncertainty import GMMUncertainty, fit_gmm_em

    rng = np.random.default_rng(0)
    centers = np.array([[0.0, 0.0, 0.0], [6.0, 0.0, 0.0], [0.0, 7.0, 0.0]])
    X = np.concatenate([
        c + 0.5 * rng.standard_normal((400, 3)) for c in centers
    ])

    p_small = fit_gmm_em(X, 3, chunk=128, seed=1)
    p_big = fit_gmm_em(X, 3, chunk=4096, seed=1)
    for k in ("means", "precisions_cholesky", "weights"):
        # f32 accumulation-order noise between chunk layouts (~3e-5)
        np.testing.assert_allclose(p_small[k], p_big[k], rtol=1e-3, atol=2e-4)

    # cluster means recovered (match each true center to nearest fit mean)
    for c in centers:
        assert np.min(np.linalg.norm(p_small["means"] - c, axis=1)) < 0.2

    gu_em = GMMUncertainty(n_components=3)
    gu_em.gmm_params = p_small
    ll_em = float(np.mean(np.asarray(gu_em.log_prob(X))))
    gm = GaussianMixture(n_components=3, random_state=0).fit(X)
    ll_sk = float(gm.score(X))
    assert ll_em > ll_sk - 0.05, (ll_em, ll_sk)

    # the fit_gmm(method="em") front door produces scoring-compatible params
    gu2 = GMMUncertainty(n_components=3, order="atomic")
    gu2.fit_gmm(X, method="em", chunk=256)
    nll_in = float(np.mean(np.asarray(gu2.get_uncertainty(X[:50]))))
    nll_out = float(np.mean(np.asarray(gu2.get_uncertainty(
        X[:50] + np.array([30.0, 0, 0])))))
    assert nll_out > nll_in + 10
