// Native smoke test: drive the TPU agent from C++ through the C ABI
// (the reference's embedding use case, mjpc/interface.h:43-48).

#include <cstdio>
#include <cstdlib>
#include <cmath>

extern "C" {
int mjpc_create_policy(const char* task, const char* planner);
int mjpc_step_policy(int handle, const double* qpos, int nq,
                     const double* qvel, int nv, double time,
                     double* action, int nu_cap);
int mjpc_set_weight(int handle, const char* term, double weight);
void mjpc_destroy_policy(int handle);
}

int main() {
  int h = mjpc_create_policy("Cartpole", "sampling");
  if (h < 0) {
    std::fprintf(stderr, "create_policy failed\n");
    return 1;
  }
  double qpos[2] = {0.0, 3.14159};
  double qvel[2] = {0.0, 0.0};
  double action[8] = {0};
  // let the async planner spin up, then query actions
  int nu = -1;
  for (int i = 0; i < 5; ++i) {
    nu = mjpc_step_policy(h, qpos, 2, qvel, 2, 0.01 * i, action, 8);
  }
  if (nu != 1 || !std::isfinite(action[0])) {
    std::fprintf(stderr, "step_policy failed (nu=%d)\n", nu);
    return 1;
  }
  if (mjpc_set_weight(h, "Velocity", 0.2) != 0) {
    std::fprintf(stderr, "set_weight failed\n");
    return 1;
  }
  mjpc_destroy_policy(h);
  std::printf("C ABI smoke test OK: nu=%d action[0]=%f\n", nu, action[0]);
  return 0;
}
