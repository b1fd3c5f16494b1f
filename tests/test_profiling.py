"""Profiling utils tests."""

import logging

from comet_tpu.utils.profiling import Timer, timed


def test_timer_measures_elapsed():
    import time

    with Timer("t") as t:
        time.sleep(0.01)
    assert t.elapsed >= 0.01


def test_timer_syncs_device_arrays():
    import jax.numpy as jnp

    with Timer("t") as t:
        x = t.sync(jnp.ones((8, 8)) * 2)
    assert t.elapsed > 0
    assert float(x[0, 0]) == 2.0


def test_timed_contextmanager():
    with timed("span") as t:
        pass
    assert t.elapsed >= 0
