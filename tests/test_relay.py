"""Health-poll behavior (utils/relay.py) — CPU-exercisable parts."""

import jax
import pytest

from asvgp_tpu.utils.relay import ensure_tpu_ready


def test_ensure_ready_round_trips_a_value_on_cpu():
    # the poll must force the probe value to HOST (a block_until_ready-only
    # probe passes straight through a wedged device-to-host path)
    dt = ensure_tpu_ready(jax.devices("cpu")[0], timeout_s=60.0)
    assert dt < 60.0


def test_ensure_ready_times_out_instead_of_hanging():
    class NeverDevice:
        platform = "fake"

    # device_put on a bogus device raises inside the probe thread; the
    # error must surface, not hang
    with pytest.raises(Exception):
        ensure_tpu_ready(NeverDevice(), timeout_s=5.0)
