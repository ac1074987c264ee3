// C ABI for embedding the TPU agent in native hosts.
//
// Reference: mjpc/interface.{h,cc} exposes create_policy / step_policy /
// set_weights so foreign programs can drive the planner without GUI/gRPC.
// Here the native library embeds the Python interpreter (the JAX runtime
// host) and forwards to mujoco_mpc_tpu.agent.interface; the TPU does the
// compute either way, so the binding layer is deliberately thin — the
// reference's native planner code has no analog because planning runs
// on-device.
//
// Build: python mujoco_mpc_tpu/native/build.py   (produces libmjpc_tpu.so)

#include <Python.h>

#include <cstdio>
#include <mutex>
#include <string>
#include <vector>

namespace {

std::once_flag g_init_once;
PyObject* g_interface = nullptr;  // mujoco_mpc_tpu.agent.interface module

void EnsureInterpreter() {
  std::call_once(g_init_once, [] {
    if (!Py_IsInitialized()) {
      Py_InitializeEx(0);
    }
    PyGILState_STATE gil = PyGILState_Ensure();
    g_interface = PyImport_ImportModule("mujoco_mpc_tpu.agent.interface");
    if (!g_interface) {
      PyErr_Print();
    }
    PyGILState_Release(gil);
  });
}

PyObject* CallMethod(const char* name, PyObject* args) {
  if (!g_interface) return nullptr;
  PyObject* fn = PyObject_GetAttrString(g_interface, name);
  if (!fn) return nullptr;
  PyObject* out = PyObject_CallObject(fn, args);
  Py_DECREF(fn);
  if (!out) PyErr_Print();
  return out;
}

PyObject* DoubleList(const double* data, int n) {
  PyObject* list = PyList_New(n);
  for (int i = 0; i < n; ++i) {
    PyList_SetItem(list, i, PyFloat_FromDouble(data[i]));
  }
  return list;
}

}  // namespace

extern "C" {

// Create an asynchronously planning agent for a registered task.
// Returns a handle > 0, or -1 on failure.
int mjpc_create_policy(const char* task, const char* planner) {
  EnsureInterpreter();
  PyGILState_STATE gil = PyGILState_Ensure();
  PyObject* args = Py_BuildValue("(ss)", task, planner ? planner : "sampling");
  PyObject* out = CallMethod("create_policy", args);
  Py_DECREF(args);
  int handle = -1;
  if (out) {
    handle = static_cast<int>(PyLong_AsLong(out));
    Py_DECREF(out);
  }
  PyGILState_Release(gil);
  return handle;
}

// Publish (qpos, qvel) and read the current policy action into `action`
// (caller-allocated, length nu). Returns nu, or -1 on failure.
int mjpc_step_policy(int handle, const double* qpos, int nq,
                     const double* qvel, int nv, double time,
                     double* action, int nu_cap) {
  PyGILState_STATE gil = PyGILState_Ensure();
  PyObject* qp = DoubleList(qpos, nq);
  PyObject* qv = DoubleList(qvel, nv);
  PyObject* args = Py_BuildValue("(iOOd)", handle, qp, qv, time);
  Py_DECREF(qp);
  Py_DECREF(qv);
  PyObject* out = CallMethod("step_policy", args);
  Py_DECREF(args);
  int nu = -1;
  if (out) {
    PyObject* seq = PySequence_Fast(out, "action not a sequence");
    if (seq) {
      nu = static_cast<int>(PySequence_Fast_GET_SIZE(seq));
      for (int i = 0; i < nu && i < nu_cap; ++i) {
        action[i] = PyFloat_AsDouble(PySequence_Fast_GET_ITEM(seq, i));
      }
      Py_DECREF(seq);
    }
    Py_DECREF(out);
  }
  PyGILState_Release(gil);
  return nu;
}

// Set one cost weight by term name. Returns 0 on success.
int mjpc_set_weight(int handle, const char* term, double weight) {
  PyGILState_STATE gil = PyGILState_Ensure();
  PyObject* weights = PyDict_New();
  PyObject* val = PyFloat_FromDouble(weight);
  PyDict_SetItemString(weights, term, val);
  Py_DECREF(val);
  PyObject* args = Py_BuildValue("(iO)", handle, weights);
  Py_DECREF(weights);
  PyObject* out = CallMethod("set_weights", args);
  Py_DECREF(args);
  int rc = out ? 0 : -1;
  Py_XDECREF(out);
  PyGILState_Release(gil);
  return rc;
}

// Stop planning and free the agent.
void mjpc_destroy_policy(int handle) {
  PyGILState_STATE gil = PyGILState_Ensure();
  PyObject* args = Py_BuildValue("(i)", handle);
  PyObject* out = CallMethod("destroy_policy", args);
  Py_DECREF(args);
  Py_XDECREF(out);
  PyGILState_Release(gil);
}

}  // extern "C"
