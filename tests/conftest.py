"""Test configuration: run JAX on 8 virtual CPU devices.

Multi-chip sharding paths are exercised on a fake CPU mesh (the standard JAX
trick; the reference never needed this because it has no cross-host
communication — SURVEY §4). x64 is enabled so the physics engine can be
validated against the MuJoCo C oracle at f64 precision.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# NOTE: the env-var JAX_PLATFORMS is ignored when the axon TPU plugin is
# present; the config call reliably forces CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# The persistent compilation cache (enabled by the package for TPU runs) is
# disabled under tests: serializing big XLA:CPU AOT executables into it has
# segfaulted in native code (put_executable_and_time → AOT serialize/zstd)
# on single-core hosts under memory pressure, killing the whole session.
# Tests run in one process, so the in-memory jit cache still dedups compiles.
jax.config.update("jax_enable_compilation_cache", False)


# ---------------------------------------------------------------- tiering
# Fast tier: `pytest -m "not slow"` finishes in minutes on a small CPU host.
# The heavy planner-convergence / behavior-drive / megakernel-equivalence
# tests are auto-marked `slow` here so individual files stay uncluttered.
_SLOW_MODULES = {
    "test_behaviors_tpu",  # real-TPU behavior drives, minutes each
}
_SLOW_TESTS = {
    # multi-iteration planner convergence (compile + 8 opt iterations each)
    "test_planner_improves_cost",
    "test_ilqg_improves_and_beats_zero_policy",
    "test_ilqg_improves_on_quaternion_model",
    "test_ilqg_improves_on_contact_task",
    "test_ilqs_picks_winner",
    "test_sharded_matches_unsharded_semantics",
    "test_sharded_cem_improves_and_contracts_std",
    "test_sharded_robust_rescoring",
    # long megakernel-vs-general equivalence rollouts
    "test_quadruped_megakernel_matches_general_path",
    "test_humanoid_megakernel_matches_general_path",
    "test_sharded_megakernel_matches_unsharded",
    "test_sharded_sampling_planner_uses_megakernel",
    # f64 trajectory parity over many steps
    "test_tendon_position_servo_trajectory_parity",
    "test_tendon_spring_damper_trajectory_parity",
    # direct-method recovery (band GN over long windows)
    "test_direct_identifies_damping_and_mass",
    "test_system_id_recovers_damping",
    # end-to-end planning over RPC (subprocess + compile under deadline)
    "test_planning_improves_over_rpc",
    "test_async_planning_over_rpc",
    "test_agent_async_plan_loop_reduces_cost",
    # driven FSM behavior locks (planner in the loop on CPU)
    "test_rubik_faces_track_targets_under_planning",
    # dashboard live loops (jit-compiles a planner)
    "test_live_loop_accrues_history",
}


def pytest_collection_modifyitems(config, items):
  import pytest
  for item in items:
    mod = item.module.__name__.rsplit(".", 1)[-1]
    name = item.name.split("[")[0]
    if mod in _SLOW_MODULES or name in _SLOW_TESTS:
      item.add_marker(pytest.mark.slow)
