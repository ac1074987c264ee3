"""CLI entry point (reference mjpc/main.cc: --task flag + run loop).

Headless equivalent: run the agent on a task, print cost/realtime stats.

  python -m mujoco_mpc_tpu --task Cartpole --planner sampling --time 5
  python -m mujoco_mpc_tpu --list
"""

import argparse
import sys


def main():
  p = argparse.ArgumentParser(prog="mujoco_mpc_tpu", description=__doc__)
  p.add_argument("--task", default="Cartpole")
  p.add_argument("--planner", default="")
  p.add_argument("--time", type=float, default=5.0,
                 help="simulated seconds")
  p.add_argument("--plan_every", type=int, default=2)
  p.add_argument("--list", action="store_true", help="list tasks and exit")
  p.add_argument("--jax_platform", default="")
  args = p.parse_args()

  if args.jax_platform:
    import jax
    jax.config.update("jax_platforms", args.jax_platform)

  from mujoco_mpc_tpu.tasks import registry
  if args.list:
    print("tasks:", ", ".join(registry.task_names()))
    from mujoco_mpc_tpu.agent import agent as agent_mod
    print("planners:", ", ".join(sorted(agent_mod._PLANNERS)))
    return 0

  from mujoco_mpc_tpu.tools.testspeed import synchronous_planning_cost
  synchronous_planning_cost(args.task, args.planner or None,
                            total_time=args.time,
                            plan_every=args.plan_every)
  return 0


if __name__ == "__main__":
  sys.exit(main())
