#!/usr/bin/env python
"""Per-kernel timing of the chembl-synth dense8 split pipeline on the
real chip.

profile_regimes.py's ablation differencing says gram 8.87 ms and solver
5.32 ms of the 13.48 ms chembl iteration — both far above their
MXU/HBM/VPU bounds (the Gram contraction is ~0.5 ms of bf16 MXU work and
~1 ms of HBM streaming at these shapes).  Ablations can't say WHERE
inside "gram" the time goes, and the axon tunnel's device trace carries
no op-level events.

METHODOLOGY (matters on this tunnel): `block_until_ready` does NOT sync
through the axon tunnel (an 8192^3 matmul "measures" 0.04 ms), and even
fetch-synced independent dispatches carry ~2 ms of per-dispatch overhead
(a 4096^3 matmul measures 2.7 ms vs its 0.7 ms bound; 8192^3 measures
7.4 vs 5.6).  The only honest out-of-context number comes from running
the op R times inside ONE jit under lax.scan — with a small input
perturbed through the carry so XLA cannot hoist the loop-invariant call
— and fetching a scalar once.  Where the only perturbable input is the
op's big input, the perturbation's own pass is measured separately
(`perturb-only`) and should be subtracted.

Usage: python scripts/chembl_kernel_bench.py [reps]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_scan(name, fn, perturb_idx, args, reps):
    """Time fn(*args) repeated `reps` times inside one jit; args[perturb_idx]
    is scaled by a carry-dependent (1 + eps) so the call can't be hoisted."""
    import jax
    import jax.numpy as jnp

    def run(s0, *a):
        def body(s, _):
            aa = list(a)
            aa[perturb_idx] = aa[perturb_idx] * (
                1.0 + s * 1e-30
            ).astype(aa[perturb_idx].dtype)
            out = fn(*aa)
            leaf = out[0] if isinstance(out, tuple) else out
            return leaf.ravel()[0].astype(jnp.float32) * 1e-30, None
        s, _ = jax.lax.scan(body, s0, None, length=reps)
        return s

    f = jax.jit(run)
    s0 = jnp.float32(0.0)
    _ = jax.device_get(f(s0, *args))          # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(f(s0, *args))
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"  {name:48s} {best * 1e3:9.3f} ms", flush=True)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from bpmf_tpu.ops.dense8 import (
        dense8_gram_rhs_cols,
        dense8_gram_rhs_rows,
        packed_tri_t,
    )
    from bpmf_tpu.ops.pallas_solve import (
        tri_combine_solve_sample,
        tri_expand_rows,
        tri_offsets,
    )

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    k = 32
    users, movies = 167_936, 512  # chembl synth padded shapes
    _, t_al = tri_offsets(k)
    key = jax.random.PRNGKey(0)
    codes = jax.random.randint(key, (users, movies), 0, 3, jnp.int32
                               ).astype(jnp.int8)
    uu = jax.random.normal(key, (k, users), jnp.bfloat16) * 0.3
    mm = jax.random.normal(key, (k, movies), jnp.bfloat16) * 0.3
    lam = jnp.eye(k, dtype=jnp.float32) * 2.0
    cs, cb, alpha = 0.5, -1.0, 2.0

    print(f"chembl kernel bench (in-scan x{reps}, ~25 ms dispatch RTT amortized): users={users} "
          f"movies={movies} K={k}", flush=True)

    # USERS half-sweep pieces (the 167936-item side; frozen side = movies)
    p_m = jax.jit(packed_tri_t)(mm)
    bench_scan("users: packed_tri_t(movies) [T,512]",
               packed_tri_t, 0, (mm,), reps)
    g_u, r_u = jax.jit(functools.partial(dense8_gram_rhs_rows, cs=cs, cb=cb)
                       )(codes, p_m, mm)
    bench_scan("users: gram kernel rows [T,167936]",
               functools.partial(dense8_gram_rhs_rows, cs=cs, cb=cb),
               1, (codes, p_m, mm), reps)
    bench_scan("users: tri_expand_rows [T_al,167936]",
               functools.partial(tri_expand_rows, k=k), 0, (g_u,), reps)
    bench_scan("users: perturb-only pass over gram",
               lambda g: g + 0.0, 0, (g_u,), reps)
    g_u_al = jax.jit(functools.partial(tri_expand_rows, k=k))(g_u)
    noise_u = jax.random.normal(key, (k, users), jnp.float32)
    bench_scan("users: tri_combine_solve_sample [167936]",
               functools.partial(tri_combine_solve_sample, alpha=alpha),
               1, (g_u_al.astype(jnp.float32), lam,
                   r_u.astype(jnp.float32), noise_u), reps)

    # MOVIES half-sweep pieces (512 items; frozen side = users -> big p_t)
    p_u = jax.jit(packed_tri_t)(uu)
    bench_scan("movies: packed_tri_t(users) [T,167936]",
               packed_tri_t, 0, (uu,), reps)
    g_m, r_m = jax.jit(functools.partial(dense8_gram_rhs_cols, cs=cs, cb=cb)
                       )(codes, p_u, uu)
    bench_scan("movies: gram kernel cols [T,512]",
               functools.partial(dense8_gram_rhs_cols, cs=cs, cb=cb),
               1, (codes, p_u, uu), reps)
    bench_scan("movies: tri_expand_rows [T_al,512]",
               functools.partial(tri_expand_rows, k=k), 0, (g_m,), reps)
    g_m_al = jax.jit(functools.partial(tri_expand_rows, k=k))(g_m)
    noise_m = jax.random.normal(key, (k, movies), jnp.float32)
    bench_scan("movies: tri_combine_solve_sample [512]",
               functools.partial(tri_combine_solve_sample, alpha=alpha),
               1, (g_m_al.astype(jnp.float32), lam,
                   r_m.astype(jnp.float32), noise_m), reps)


main()
