import time, numpy as np, jax, jax.numpy as jnp
import automationlabsmodelpredictivecontrol_jl_tpu as mpc
from automationlabsmodelpredictivecontrol_jl_tpu import parallel
from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import qtp
from automationlabsmodelpredictivecontrol_jl_tpu.ops.admm import AdmmConfig
from automationlabsmodelpredictivecontrol_jl_tpu.ops.riccati import RiccatiConfig

B = 2048
sys_lin = qtp.linearized_discrete_system()
x_ref = np.full(4, 0.65, np.float32); u_ref = np.full(2, 1.2, np.float32)
rng = np.random.default_rng(0)
x0s = jnp.asarray(np.clip(0.65 + 0.1*rng.standard_normal((B,4)), 0.3, 1.3), np.float32)

def timeit(fn, reps=3):
    out = fn(); jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps): out = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter()-t0)/reps, out

for N in (400, 800):
    for eng, kw in (("condensed", dict(admm_config=AdmmConfig(max_iter=1000))),
                    ("riccati", dict(riccati_config=RiccatiConfig(max_iter=1000)))):
        try:
            c = mpc.proceed_controller(sys_lin, "model_predictive_control", N, 5.0, x_ref, u_ref,
                engine=eng, **kw)
            wz, wy = parallel.init_warm_batch(c, B)
            sv = jax.jit(lambda x,z,y,c=c: parallel.solve_batch(c, x, z, y))
            dt, (_,_,_,d) = timeit(lambda: sv(x0s, wz, wy))
            print(f"h{N} {eng}-vmap: {B/dt:9.0f} solves/s conv={int(d.n_converged)/B:.4f} it={float(d.mean_iterations):.0f}", flush=True)
        except Exception as e:
            print(f"h{N} {eng}-vmap: FAILED {type(e).__name__}: {e}", flush=True)
