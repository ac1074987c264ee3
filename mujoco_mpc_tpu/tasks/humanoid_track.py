"""Humanoid Track: mocap-marker tracking with interpolated reference frames
(reference: mjpc/tasks/humanoid/tracking/tracking.cc:28-141,190-195).

The reference embeds CMU mocap clips as model keyframes (key_mpos) and
linearly interpolates between frames at 30 fps; markers are compared
mean-centered (a translation-invariant shape match) plus an average-
position term, with finite-difference marker velocities. The CMU data files
are not shipped here, so the clips are *procedurally synthesized* marker
trajectories (walk and run gaits) baked as jit constants — identical
residual structure and interpolation math, different motion source.

Residual layout (tracking.cc:92-188):
  (0) joint velocity (nv − 6)
  (1) control (nu)
  (2) average marker position error (3)
  (3) per-marker mean-centered position error (nmarker × 3)
  (4) per-marker velocity error (nmarker × 3)

Modes select the motion clip (reference kMotionLengths); userdata[0]
stores the reference start time so Reset/time-jumps re-anchor the clip.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from mujoco_mpc_tpu.tasks import base, registry

_FPS = 30.0
# markers: (body name, lateral sign) — pelvis/torso plus end effectors
_MARKERS = ("pelvis", "torso", "right_foot", "left_foot",
            "right_lower_arm", "left_lower_arm")
_NM = len(_MARKERS)
# MODE_NAMES defined below: procedural Walk/Run + any recorded clip files


def _synth_clip(speed, cadence, step_len, length):
  """Procedural gait marker clip (length, nmarker, 3) at 30 fps.

  Marker geometry targets the full dm_control humanoid
  (dm_suite._humanoid_spec at the home keyframe: pelvis z 0.86, torso z
  1.28, feet at y ±0.09 / z 0.024, lower arms at y ±0.35 / z 1.16)."""
  t = np.arange(length) / _FPS
  phase = 2 * np.pi * cadence * t
  x0 = speed * t
  clip = np.zeros((length, _NM, 3))
  # pelvis / torso: forward translation with slight bob
  clip[:, 0] = np.stack([x0, 0 * t, 0.86 + 0.02 * np.cos(2 * phase)], -1)
  clip[:, 1] = np.stack([x0, 0 * t, 1.28 + 0.02 * np.cos(2 * phase)], -1)
  # feet: alternating swing; ground contact half the cycle
  # (marker order: right then left; right side is −y on the dm humanoid)
  amp = 0.5 * step_len
  lift = 0.05 + 0.05 * (speed > 1.5)
  for i, (sgn, ph) in enumerate(((-1, 0.0), (1, np.pi))):
    s = np.sin(phase + ph)
    swing = np.maximum(np.sin(phase + ph), 0.0)
    clip[:, 2 + i] = np.stack([
        x0 + amp * s, sgn * 0.09 * np.ones_like(t), 0.03 + lift * swing], -1)
  # lower arms: counter-swing just above hip height
  for i, (sgn, ph) in enumerate(((-1, np.pi), (1, 0.0))):
    s = np.sin(phase + ph)
    clip[:, 4 + i] = np.stack([
        x0 + 0.18 + 0.3 * amp * s, sgn * 0.35 * np.ones_like(t),
        1.16 + 0.02 * s], -1)
  return clip


def _load_clip_files():
  """Recorded marker clips from tasks/models/assets/clips/*.npz.

  Clip file format (the shippable analogue of the reference's CMU
  keyframe data, tracking.cc:28-141): npz with `markers` (L, nmarker, 3)
  world positions in _MARKERS order, `fps` scalar, and optional `name`.
  Clips at other rates are linearly resampled to 30 fps at load.
  Recorded with tools/record_clip.py (from a driven simulation)."""
  import glob
  import os

  clip_dir = os.path.join(os.path.dirname(__file__), "models", "assets",
                          "clips")
  out = []
  for path in sorted(glob.glob(os.path.join(clip_dir, "*.npz"))):
    z = np.load(path, allow_pickle=False)
    markers = np.asarray(z["markers"], dtype=np.float64)
    if markers.ndim != 3 or markers.shape[1] != _NM:
      continue  # wrong marker set
    fps = float(z["fps"]) if "fps" in z else _FPS
    if abs(fps - _FPS) > 1e-6:  # resample to 30 fps
      t_src = np.arange(markers.shape[0]) / fps
      t_dst = np.arange(int(t_src[-1] * _FPS) + 1) / _FPS
      res = np.empty((len(t_dst),) + markers.shape[1:])
      for k in range(_NM):
        for c in range(3):
          res[:, k, c] = np.interp(t_dst, t_src, markers[:, k, c])
      markers = res
    name = str(z["name"]) if "name" in z else \
        os.path.splitext(os.path.basename(path))[0]
    out.append((name.title(), markers))
  return out


_FILE_CLIPS = _load_clip_files()
_CLIPS = tuple([_synth_clip(1.0, 1.4, 0.5, 180),   # Walk (procedural)
                _synth_clip(2.5, 2.6, 0.9, 120)] +  # Run (procedural)
               [c for _, c in _FILE_CLIPS])
MODE_NAMES = tuple(["Walk", "Run"] + [n for n, _ in _FILE_CLIPS])
_MAXLEN = max(c.shape[0] for c in _CLIPS)
# pad to a common length so clip selection is a traced gather
_CLIP_ARR = jnp.asarray(np.stack([
    np.concatenate([c, np.repeat(c[-1:], _MAXLEN - len(c), 0)]) if
    len(c) < _MAXLEN else c for c in _CLIPS]))  # (nclip, L, nm, 3)
_CLIP_LEN = jnp.asarray([c.shape[0] for c in _CLIPS])


def _marker_pos(model, data):
  ids = [model.body(n) for n in _MARKERS]
  return jnp.stack([data.xpos[i] for i in ids])  # (nm, 3)


def _marker_vel(model, data):
  ids = [model.body(n) for n in _MARKERS]
  out = []
  for i in ids:
    v = data.cvel[i][3:] + jnp.cross(data.cvel[i][:3], data.xipos[i])
    out.append(v)
  return jnp.stack(out)


def _interp_frames(clip_id, index):
  """Linear interpolation between consecutive frames (tracking.cc:29-39),
  plus the FD reference velocity."""
  max_index = (_CLIP_LEN[clip_id] - 1).astype(index.dtype)
  idx = jnp.clip(index, 0.0, max_index)
  i0 = jnp.floor(idx).astype(jnp.int32)
  i1 = jnp.minimum(i0 + 1, max_index.astype(jnp.int32))
  w1 = idx - i0
  clip = _CLIP_ARR[clip_id]
  pos = (1.0 - w1)[..., None, None] * clip[i0] + \
      w1[..., None, None] * clip[i1]
  vel = (clip[i1] - clip[i0]) * _FPS
  return pos, vel


def residual(model, data, params):
  dtype = data.qpos.dtype
  u = data.userdata
  clip_id = u[base.MODE_SLOT].astype(jnp.int32)
  ref_time = u[0]
  index = (data.time - ref_time) * _FPS

  ref_pos, ref_vel = _interp_frames(clip_id, index.astype(jnp.float32))
  ref_pos = ref_pos.astype(dtype)
  ref_vel = ref_vel.astype(dtype)
  cur_pos = _marker_pos(model, data)
  cur_vel = _marker_vel(model, data)

  joint_vel = data.qvel[6:]
  home_ctrl = jnp.asarray(model.keyframe("home")[2], dtype=dtype)
  control = data.ctrl - home_ctrl

  avg_ref = jnp.mean(ref_pos, axis=0)
  avg_cur = jnp.mean(cur_pos, axis=0)
  avg_err = avg_ref - avg_cur
  centered = (ref_pos - avg_ref) - (cur_pos - avg_cur)  # (nm, 3)
  vel_err = ref_vel - cur_vel

  return jnp.concatenate([
      joint_vel, control, avg_err, centered.ravel(), vel_err.ravel(),
  ])


def transition(model, data, params):
  """Re-anchor the clip on reset / time jump backwards; loop the clip
  (the reference clamps at the last frame; looping keeps the episode
  going without host intervention)."""
  u = data.userdata
  clip_id = u[base.MODE_SLOT].astype(jnp.int32)
  length = (_CLIP_LEN[clip_id] - 1).astype(u.dtype) / _FPS
  elapsed = data.time - u[0]
  # jumped backwards (reset) or ran past the clip end → re-anchor
  re_anchor = (elapsed < 0.0) | (elapsed > length)
  u = u.at[0].set(jnp.where(re_anchor, data.time, u[0]))
  return data.replace(userdata=u)


@registry.register("Humanoid Track")
def make(dtype=jnp.float32) -> base.Task:
  from mujoco_mpc_tpu.tasks import dm_suite
  model, spec, params, pnames = registry.load_task_model_from_builder(
      dm_suite.build_humanoid_track, dtype)
  return base.Task(name="Humanoid Track", model=model, spec=spec,
                   params=params, residual=residual, transition=transition,
                   mode_names=MODE_NAMES, param_names=pnames)
