import time, numpy as np, jax, jax.numpy as jnp
import automationlabsmodelpredictivecontrol_jl_tpu as mpc
from automationlabsmodelpredictivecontrol_jl_tpu import parallel
from automationlabsmodelpredictivecontrol_jl_tpu.benchmarks import qtp
from automationlabsmodelpredictivecontrol_jl_tpu.ops.admm import AdmmConfig

HORIZON, BATCH = 20, 16384
sys = qtp.linearized_discrete_system()
rng = np.random.default_rng(0)
x0s = jnp.asarray(np.clip(0.65 + 0.15*rng.standard_normal((BATCH,4)), 0.25, 1.3), jnp.float32)
cfg = AdmmConfig(max_iter=100, rho=1.0, rho_grid=(1.0,10.0), refine_steps=0)
c = mpc.proceed_controller(sys, "model_predictive_control", HORIZON, qtp.SAMPLE_TIME,
    np.full(4,0.65,np.float32), np.full(2,1.2,np.float32), admm_config=cfg)
wz, wy = parallel.init_warm_batch(c, BATCH)

def timeit(fn, reps=10):
    out = fn(); jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps): out = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter()-t0)/reps, out

sv = jax.jit(lambda x,z,y: parallel.solve_batch(c, x, z, y))
dt, (_,_,_,d) = timeit(lambda: sv(x0s, wz, wy))
print(f"vmap mi=100:  {BATCH/dt:9.0f} solves/s conv={int(d.n_converged)/BATCH:.4f} it={float(d.mean_iterations):.0f}", flush=True)
sf = jax.jit(lambda x,z,y: parallel.solve_batch_fused(c, x, z, y))
dt, (_,_,_,d) = timeit(lambda: sf(x0s, wz, wy))
print(f"fused mi=100: {BATCH/dt:9.0f} solves/s conv={int(d.n_converged)/BATCH:.4f} it={float(d.mean_iterations):.0f}", flush=True)
