"""Build the native C ABI library (libmjpc_tpu.so) and its smoke test.

Usage: python mujoco_mpc_tpu/native/build.py [--test]
"""

import os
import subprocess
import sys
import sysconfig


def flags():
  inc = sysconfig.get_paths()["include"]
  libdir = sysconfig.get_config_var("LIBDIR")
  ver = sysconfig.get_config_var("LDVERSION")
  return inc, libdir, ver


def build():
  here = os.path.dirname(os.path.abspath(__file__))
  inc, libdir, ver = flags()
  out = os.path.join(here, "libmjpc_tpu.so")
  cmd = [
      "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
      f"-I{inc}", os.path.join(here, "mjpc_capi.cc"),
      f"-L{libdir}", f"-lpython{ver}", "-ldl", "-lm",
      f"-Wl,-rpath,{libdir}", "-o", out,
  ]
  subprocess.run(cmd, check=True)
  print("built", out)
  return out


def build_test():
  here = os.path.dirname(os.path.abspath(__file__))
  inc, libdir, ver = flags()
  exe = os.path.join(here, "capi_smoke")
  cmd = [
      "g++", "-O2", "-std=c++17", os.path.join(here, "capi_smoke.cc"),
      os.path.join(here, "libmjpc_tpu.so"),
      f"-L{libdir}", f"-lpython{ver}", "-ldl", "-lm",
      f"-Wl,-rpath,{libdir}", f"-Wl,-rpath,{here}", "-o", exe,
  ]
  subprocess.run(cmd, check=True)
  print("built", exe)
  return exe


if __name__ == "__main__":
  build()
  if "--test" in sys.argv:
    exe = build_test()
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    env["PYTHONPATH"] = repo + ":" + env.get("PYTHONPATH", "")
    subprocess.run([exe], check=True, env=env)
