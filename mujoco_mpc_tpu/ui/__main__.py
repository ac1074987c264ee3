from mujoco_mpc_tpu.ui.server import main

main()
