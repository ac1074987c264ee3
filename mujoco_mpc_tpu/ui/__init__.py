"""Interactive web dashboard (the reference GUI surface, headless-native).

See ui.server for the full map to mjpc/simulate.{h,cc} + app.cc.
"""

from mujoco_mpc_tpu.ui.server import AgentUI, make_server  # noqa: F401
