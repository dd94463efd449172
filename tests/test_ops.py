"""Concrete distribution, Gaussian KL, and annealing schedule unit tests."""

import numpy as np
import jax
import jax.numpy as jnp

from air_tpu.ops.concrete import (
    concrete_binary_sample,
    concrete_binary_pre_sigmoid_sample,
    concrete_binary_kl_mc_sample,
)
from air_tpu.ops.gaussian import sample_from_mvn, gaussian_kl
from air_tpu.ops.schedules import annealed_value, exponential_decay, resolve_annealed
from tests.oracles import np_concrete_kl, np_gaussian_kl, np_exponential_decay


# --- Concrete ---------------------------------------------------------------

def test_concrete_kl_matches_oracle(rng):
    y = rng.normal(size=64)
    post_lo = rng.normal(size=64)
    got = np.asarray(concrete_binary_kl_mc_sample(
        jnp.asarray(y), -2.0, 1.0, jnp.asarray(post_lo), 1.0))
    want = np_concrete_kl(y, -2.0, 1.0, post_lo, 1.0)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-4)


def test_concrete_kl_zero_when_posterior_equals_prior(rng):
    y = rng.normal(size=16)
    lo = rng.normal(size=16)
    kl = np.asarray(concrete_binary_kl_mc_sample(
        jnp.asarray(y), jnp.asarray(lo), 1.0, jnp.asarray(lo), 1.0))
    np.testing.assert_allclose(kl, 0.0, atol=1e-6)


def test_pre_sigmoid_sample_distribution():
    """(log_odds + logistic)/temp: mean ~ log_odds/temp; sigmoid of sample at
    high log_odds is ~1."""
    key = jax.random.PRNGKey(0)
    log_odds = jnp.full((20000,), 2.0)
    y = concrete_binary_pre_sigmoid_sample(key, log_odds, 2.0)
    assert abs(float(jnp.mean(y)) - 1.0) < 0.05  # logistic noise is mean 0
    y2 = concrete_binary_pre_sigmoid_sample(key, jnp.full((20000,), 10.0), 1.0)
    assert float(jnp.mean(jax.nn.sigmoid(y2))) > 0.99


def test_concrete_hard_sample_straight_through():
    key = jax.random.PRNGKey(1)

    def f(lo):
        _, sig = concrete_binary_sample(key, lo, 1.0, hard=True)
        return jnp.sum(sig)

    lo = jnp.zeros((32,))
    _, sig = concrete_binary_sample(key, lo, 1.0, hard=True)
    assert set(np.unique(np.asarray(sig))) <= {0.0, 1.0}
    g = jax.grad(f)(lo)
    assert np.any(np.asarray(g) != 0)  # gradient flows through relaxation


# --- Gaussian ----------------------------------------------------------------

def test_gaussian_kl_matches_oracle(rng):
    mean = rng.normal(size=(8, 5))
    log_var = rng.normal(size=(8, 5)) * 0.3
    got = np.asarray(gaussian_kl(jnp.asarray(mean), jnp.asarray(log_var),
                                 -1.0, 0.05))
    want = np_gaussian_kl(mean, log_var, -1.0, 0.05)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_gaussian_kl_zero_at_prior():
    mean = jnp.full((4, 3), 0.7)
    log_var = jnp.full((4, 3), jnp.log(0.2))
    kl = gaussian_kl(mean, log_var, 0.7, 0.2)
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-6)


def test_sample_from_mvn_stats():
    key = jax.random.PRNGKey(0)
    mean = jnp.full((100000, 1), 3.0)
    var = jnp.full((100000, 1), 4.0)
    s = sample_from_mvn(key, mean, var)
    assert abs(float(jnp.mean(s)) - 3.0) < 0.05
    assert abs(float(jnp.std(s)) - 2.0) < 0.05


# --- Schedules ---------------------------------------------------------------

def test_exponential_decay_values():
    # the reference training schedule: init 1e4, factor 0.1 per 3000 iters,
    # min 1e-9, log (reference training.py:110-121)
    sched = {"init": 10000.0, "min": 1e-9, "factor": 0.1, "iters": 3000,
             "staircase": False, "log": True}
    for step in [0, 1500, 3000, 30000, 39000, 100000]:
        got = float(annealed_value(sched, step))
        want = np_exponential_decay(10000.0, step, 3000, 0.1,
                                    vmin=1e-9, log=True)
        np.testing.assert_allclose(got, want, rtol=1e-4)
    # log-odds slide ~9.21 -> ~-20.7 (SURVEY.md §2a default config row)
    np.testing.assert_allclose(float(annealed_value(sched, 0)),
                               np.log(1e4 + 1e-9), rtol=1e-4)
    assert float(annealed_value(sched, 100000)) < -20.0


def test_staircase_and_max():
    assert float(exponential_decay(1.0, 1500, 1000, 0.5, staircase=True)) == 0.5
    sched = {"init": 1.0, "iters": 10, "factor": 2.0, "max": 3.0}
    assert float(annealed_value(sched, 100)) == 3.0


def test_resolve_annealed_traceable():
    defaults = {"z_pres_prior_log_odds": -0.01, "learning_rate": 1e-4}
    scheds = {"z_pres_prior_log_odds":
              {"init": 10000.0, "min": 1e-9, "factor": 0.1, "iters": 3000,
               "log": True}}

    @jax.jit
    def f(step):
        return resolve_annealed(scheds, defaults, step)["z_pres_prior_log_odds"]

    np.testing.assert_allclose(float(f(0)), np.log(1e4 + 1e-9), rtol=1e-4)
    assert float(f(60000)) < -20.0


def test_annealed_hold_then_decay():
    sched = {"init": 100.0, "iters": 10, "factor": 0.1, "hold": 50}
    np.testing.assert_allclose(float(annealed_value(sched, 0)), 100.0)
    np.testing.assert_allclose(float(annealed_value(sched, 50)), 100.0)
    np.testing.assert_allclose(float(annealed_value(sched, 60)), 10.0,
                               rtol=1e-5)
    # absent hold == reference behavior
    ref = {"init": 100.0, "iters": 10, "factor": 0.1}
    np.testing.assert_allclose(float(annealed_value(ref, 10)), 10.0,
                               rtol=1e-5)
