"""The PosteriorDB-PRESENT codepath (VERDICT r4 weak #7).

models/data.py and experiments/evaluate.py branch on
``$MCMC_WORKDIR/posteriordb/posterior_database`` — the path a networked
deployment would take (reference: scripts/eval_eight_schools.py:17-18
reads a local PosteriorDB clone directly).  The zero-egress environment
can never exercise it against the real database, so these tests build a
tiny on-disk fixture with the exact PosteriorDB layout (zipped data
JSONs, zipped reference-draw chain blobs) and assert that

* the data loaders prefer the fixture's data over the vendored fallback,
* ``posteriordb_reference_draws`` maps chain blobs into the comparison
  spaces (eight_schools: [mu, log tau, theta_base]; kidiq:
  [beta(3), log sigma]; diamonds: [Intercept, b(24), log sigma]), and
* ``get_reference_draws`` prefers real gold over vendored/self-generated.
"""

from __future__ import annotations

import json
import zipfile

import numpy as np
import pytest

from adaptive_mcmc_tpu.experiments import evaluate
from adaptive_mcmc_tpu.models import data as mdata


def _write_zipped_json(path, obj):
    path.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(path.stem, json.dumps(obj))


@pytest.fixture
def pdb_root(tmp_path, monkeypatch):
    """A minimal PosteriorDB clone under $MCMC_WORKDIR."""
    root = tmp_path / "posteriordb" / "posterior_database"
    data = root / "data" / "data"
    draws = root / "reference_posteriors" / "draws" / "draws"

    # --- data JSONs (distinctive values, NOT the vendored ones) ---
    _write_zipped_json(
        data / "eight_schools.json.zip",
        {"J": 8, "y": [float(i) for i in range(1, 9)],
         "sigma": [2.0] * 8},
    )
    # kidiq ships unzipped in some checkouts — cover the plain-JSON branch
    data.mkdir(parents=True, exist_ok=True)
    (data / "kidiq.json").write_text(json.dumps({
        "N": 5, "kid_score": [90.0, 91.0, 92.0, 93.0, 94.0],
        "mom_hs": [0.0, 1.0, 1.0, 0.0, 1.0],
        "mom_iq": [95.0, 100.0, 105.0, 110.0, 115.0],
    }))

    # --- reference draws: 2 chains x 3 draws each ---
    rng = np.random.default_rng(0)

    def chain(names):
        return {k: rng.standard_normal(3).tolist() for k in names}

    es_names = (["mu", "tau"] + [f"theta[{i}]" for i in range(1, 9)])
    es = []
    for _ in range(2):
        c = chain(es_names)
        c["tau"] = np.abs(rng.standard_normal(3) + 2.0).tolist()
        es.append(c)
    _write_zipped_json(
        draws / "eight_schools-eight_schools_noncentered.json.zip", es
    )

    kq_names = [f"beta[{i}]" for i in range(1, 4)] + ["sigma"]
    kq = []
    for _ in range(2):
        c = chain(kq_names)
        c["sigma"] = np.abs(rng.standard_normal(3) + 18.0).tolist()
        kq.append(c)
    _write_zipped_json(draws / "kidiq-kidscore_momhsiq.json.zip", kq)

    dm_names = ["Intercept"] + [f"b[{i}]" for i in range(1, 25)] + ["sigma"]
    dm = []
    for _ in range(2):
        c = chain(dm_names)
        c["sigma"] = np.abs(rng.standard_normal(3) + 0.2).tolist()
        dm.append(c)
    _write_zipped_json(draws / "diamonds-diamonds.json.zip", dm)

    monkeypatch.setenv("MCMC_WORKDIR", str(tmp_path))
    # the data loaders are lru_cached on top of the env branch
    mdata.eight_schools.cache_clear()
    mdata.kidiq.cache_clear()
    mdata.diamonds.cache_clear()
    yield root
    mdata.eight_schools.cache_clear()
    mdata.kidiq.cache_clear()
    mdata.diamonds.cache_clear()


def test_data_loader_prefers_posteriordb(pdb_root):
    es = mdata.eight_schools()
    np.testing.assert_allclose(es["y"], np.arange(1, 9, dtype=np.float32))
    np.testing.assert_allclose(es["sigma"], 2.0)

    kq = mdata.kidiq()  # plain-JSON (unzipped) branch
    assert kq["kid_score"].shape == (5,)
    np.testing.assert_allclose(kq["mom_hs"], [0, 1, 1, 0, 1])


def test_data_loader_fallback_without_posteriordb(monkeypatch):
    monkeypatch.delenv("MCMC_WORKDIR", raising=False)
    mdata.eight_schools.cache_clear()
    es = mdata.eight_schools()
    assert float(es["y"][0]) == 28.0  # vendored Rubin (1981)
    mdata.eight_schools.cache_clear()


def test_reference_draws_mapping(pdb_root):
    es = evaluate.posteriordb_reference_draws("eight_schools")
    assert es is not None and es.shape == (6, 10) and es.dtype == np.float32
    # col 1 is log(tau); cols 2: are (theta - mu) / tau
    assert np.all(np.isfinite(es))

    kq = evaluate.posteriordb_reference_draws("kidiq")
    assert kq.shape == (6, 4)

    dm = evaluate.posteriordb_reference_draws("diamonds")
    assert dm.shape == (6, 26)


def test_reference_draw_roundtrip_values(pdb_root):
    """The mapping is exact, not just shape-correct: reconstruct the raw
    parameters from the comparison space and compare to the blob."""
    import zipfile as _zf

    p = (pdb_root / "reference_posteriors" / "draws" / "draws"
         / "eight_schools-eight_schools_noncentered.json.zip")
    with _zf.ZipFile(p) as zf:
        with zf.open(zf.namelist()[0]) as f:
            chains = json.load(f)
    mu = np.concatenate([np.asarray(c["mu"]) for c in chains])
    tau = np.concatenate([np.asarray(c["tau"]) for c in chains])
    th1 = np.concatenate([np.asarray(c["theta[1]"]) for c in chains])

    es = evaluate.posteriordb_reference_draws("eight_schools")
    np.testing.assert_allclose(es[:, 0], mu, rtol=1e-6)
    np.testing.assert_allclose(np.exp(es[:, 1]), tau, rtol=1e-5)
    np.testing.assert_allclose(
        es[:, 2] * tau + mu, th1, rtol=1e-4, atol=1e-5
    )


def test_get_reference_draws_prefers_real_gold(pdb_root):
    """With PosteriorDB present, eval gold is the 6-draw fixture — not the
    vendored 10k diamonds gold and not self-generated draws."""
    dm = evaluate.get_reference_draws("diamonds")
    assert dm.shape[0] == 6  # vendored gold has 10k rows

    es = evaluate.get_reference_draws("eight_schools")
    assert es.shape[0] == 6


def test_get_reference_draws_absent_falls_back(monkeypatch, tmp_path):
    monkeypatch.setenv("MCMC_WORKDIR", str(tmp_path))  # empty workdir
    dm = evaluate.get_reference_draws("diamonds")
    assert dm.shape == (10_000, 26)  # vendored real gold standard
