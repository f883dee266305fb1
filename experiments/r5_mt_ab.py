"""On-chip A/B: v1 watertight leaf vs v1 Moller-Trumbore (LEAF_MT) leaf.

Single process.  The MT flag is flipped by monkeypatching the module
globals (pack_tiles8 and the kernel's leaf_step both read their module's
LEAF_MT at call/trace time) + jax.clear_caches() to force a retrace; the
scene is rebuilt per variant so the tile packing matches the kernel.

Measures raw primary (coherent camera) and bounce (incoherent) batches:
Mrays/s, steps/packet, ns/grid-step, plus hit-id agreement vs the
watertight baseline (expected ~1.0; differences are shared-edge ulp
cases where MT loses the watertight guarantee).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    x = float(jnp.ones((8, 8)).sum())
    print(f"probe ok ({x}) in {time.time() - t0:.1f}s", flush=True)

    import bench as B
    import shimmer_tpu.ops.bvh8 as B8
    import shimmer_tpu.ops.pallas.traverse as T

    n = 1 << 17
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    results, ref_out = {}, {}
    for pass_i, variant in enumerate(
        ("watertight", "mt", "watertight", "mt")
    ):
        B8.LEAF_MT = variant == "mt"
        T.LEAF_MT = variant == "mt"
        jax.clear_caches()
        scene, cam, film, n_tri = B.build_bench_scene(300000)
        tris = scene.triangles
        w, h = film.resolution
        xs = (np.arange(n) % w).astype(np.float32) + 0.5
        ys = ((np.arange(n) // w) % h).astype(np.float32) + 0.5
        ray = cam.generate_ray(
            jnp.asarray(np.stack([xs, ys], -1)), jnp.zeros((n, 2), np.float32)
        )
        o_b = jnp.asarray(pts * 1.05)
        d_b = jnp.asarray(dirs)

        print(f"--- variant {variant} ---", flush=True)
        fn = jax.jit(
            lambda o, d: T.traverse_packets_raw(
                tris, o, d, jnp.inf, return_steps=True, sort_rays=True
            )
        )
        for name, o, d in (("primary", ray.o, ray.d), ("bounce", o_b, d_b)):
            for k in range(3):
                r = fn(o + 1e-6 * k, d)
            jax.block_until_ready(r)
            t0 = time.time()
            reps = 4
            for k in range(reps):
                r = fn(o + 1e-5 * k, d)
            jax.block_until_ready(r)
            dt = (time.time() - t0) / reps
            t, tri, steps = r
            steps_np = np.asarray(steps).reshape(-1, T.P)[:, 0]
            spp_ = float(steps_np.mean())
            gs = steps_np.reshape(-1, T.K_PACKETS).max(1).sum()
            mray = n / dt / 1e6
            nsstep = dt / max(gs, 1) * 1e9
            print(
                f"{variant} {name}: {mray:8.3f} Mrays/s  "
                f"{spp_:7.1f} steps/packet  {nsstep:6.1f} ns/grid-step",
                flush=True,
            )
            results.setdefault((variant, name), []).append(mray)
            tri_np = np.asarray(tri)
            if name not in ref_out:
                ref_out[name] = tri_np
            else:
                same = (tri_np == ref_out[name]).mean()
                print(f"  hit agreement vs watertight: {same:.6f}", flush=True)
    for nm in ("primary", "bounce"):
        wt = results[("watertight", nm)]
        mt = results[("mt", nm)]
        print(
            f"SPEEDUP {nm} mt: {max(mt) / max(wt):.3f}x "
            f"(best-of; wt={[round(x, 2) for x in wt]} "
            f"mt={[round(x, 2) for x in mt]})",
            flush=True,
        )


if __name__ == "__main__":
    main()
