"""Checkpoint/resume driver: interruption-resume equivalence and health
checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_mcmc_tpu import arwmh, models, run_mcmc
from adaptive_mcmc_tpu.infer import (
    ChainHealthError,
    check_chain_health,
    run_mcmc_checkpointed,
)


def test_matches_uninterrupted_run(tmp_path):
    t = models.std_normal(3)
    k = arwmh(t)
    want, _, want_state = run_mcmc(
        k, jax.random.PRNGKey(0), num_warmup=5, num_samples=40,
        thinning=2, n_chains=4,
    )
    got, _, got_state = run_mcmc_checkpointed(
        k, jax.random.PRNGKey(0), 5, 40, thinning=2, n_chains=4,
        checkpoint_dir=tmp_path / "a", chunk_size=16,
    )
    np.testing.assert_allclose(np.asarray(want), got, rtol=1e-6)
    np.testing.assert_allclose(
        want_state.position, got_state.position, rtol=1e-6
    )


def test_resume_after_interruption(tmp_path):
    t = models.std_normal(2)
    k = arwmh(t)
    d = tmp_path / "b"
    # run only the first chunk, then "crash"
    run_mcmc_checkpointed(
        k, jax.random.PRNGKey(1), 0, 16, n_chains=2,
        checkpoint_dir=d, chunk_size=16,
    )
    # extend the run: resumes from the saved state, no recomputation
    got, _, _ = run_mcmc_checkpointed(
        k, jax.random.PRNGKey(1), 0, 48, n_chains=2,
        checkpoint_dir=d, chunk_size=16,
    )
    assert got.shape == (48, 2, 2)
    want, _, _ = run_mcmc(
        k, jax.random.PRNGKey(1), num_warmup=0, num_samples=48, n_chains=2
    )
    np.testing.assert_allclose(np.asarray(want), got, rtol=1e-6)


def test_health_check_fires():
    t = models.std_normal(2)
    k = arwmh(t)
    st = k.init(jax.random.PRNGKey(2), n_chains=4)
    check_chain_health(st)  # fine
    bad = st._replace(
        potential_energy=st.potential_energy.at[0].set(jnp.inf)
    )
    with pytest.raises(ChainHealthError):
        check_chain_health(bad)
    worse = st._replace(position=st.position.at[0, 0].set(jnp.nan))
    with pytest.raises(ChainHealthError):
        check_chain_health(worse)
