"""On-chip A/B: r4 kernel (v1) vs r5 ordered dual-stack kernel (v2).

Single process, probe-then-batch (memory: axon tunnel wedges on client
churn).  Both variants must be compiled in ONE process: KERNEL_V1 is
read at import, so we reload the traverse module per variant.

Measures primary (coherent camera) and bounce (incoherent) rays on the
bench scene: Mrays/s, steps/packet, ns/grid-step — the VERDICT r4
attribution triple, now timed on the SAME configuration that counts
steps (r4 mixed sorted/unsorted configs).
"""
import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    # probe
    t0 = time.time()
    x = float(jnp.ones((8, 8)).sum())
    print(f"probe ok ({x}) in {time.time() - t0:.1f}s", flush=True)

    import bench as B

    scene, cam, film, n_tri = B.build_bench_scene(300000)
    tris = scene.triangles
    n = 1 << 17
    w, h = film.resolution
    rng = np.random.default_rng(1)
    xs = (np.arange(n) % w).astype(np.float32) + 0.5
    ys = ((np.arange(n) // w) % h).astype(np.float32) + 0.5
    ray = cam.generate_ray(
        jnp.asarray(np.stack([xs, ys], -1)), jnp.zeros((n, 2), np.float32)
    )
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    o_b = jnp.asarray(pts * 1.05)
    d_b = jnp.asarray(dirs)

    results = {}
    ref_out = {}
    VARIANTS = {
        # name: (KERNEL_V1, SHIMMER_ORDERED, KPACKETS, UNIFIED)
        "uni-k4": ("0", "1", "4", "1"),
        "uni-k8": ("0", "1", "8", "1"),
        "dual-k4": ("0", "1", "4", "0"),
        "v1-k4": ("1", "1", "4", "0"),
    }
    for variant, (kv1, ordv, kp, uni) in VARIANTS.items():
        os.environ["SHIMMER_KERNEL_V1"] = kv1
        os.environ["SHIMMER_ORDERED"] = ordv
        os.environ["SHIMMER_KPACKETS"] = kp
        os.environ["SHIMMER_UNIFIED"] = uni
        import shimmer_tpu.ops.pallas.traverse as T

        importlib.reload(T)
        from shimmer_tpu.ops.pallas.traverse import (
            K_PACKETS,
            P,
            traverse_packets_raw,
        )

        print(f"--- variant {variant} ---", flush=True)
        fn = jax.jit(
            lambda o, d: traverse_packets_raw(
                tris, o, d, jnp.inf, return_steps=True, sort_rays=True
            )
        )
        for name, o, d in (("primary", ray.o, ray.d), ("bounce", o_b, d_b)):
            for k in range(3):
                r = fn(o + 1e-6 * k, d)
            jax.block_until_ready(r)
            t0 = time.time()
            reps = 3
            for k in range(reps):
                r = fn(o + 1e-5 * k, d)
            jax.block_until_ready(r)
            dt = (time.time() - t0) / reps
            t, tri, steps = r
            steps_np = np.asarray(steps).reshape(-1, P)[:, 0]
            spp_ = float(steps_np.mean())
            gs = steps_np.reshape(-1, K_PACKETS).max(1).sum()
            mray = n / dt / 1e6
            nsstep = dt / max(gs, 1) * 1e9
            print(
                f"{variant} {name}: {mray:8.3f} Mrays/s  "
                f"{spp_:7.1f} steps/packet  {nsstep:6.1f} ns/grid-step",
                flush=True,
            )
            results[(variant, name)] = (mray, spp_, nsstep)
            tri_np = np.asarray(tri)
            if (name,) not in ref_out:
                ref_out[(name,)] = tri_np
            else:
                same = (tri_np == ref_out[(name,)]).mean()
                if same < 1.0:
                    print(f"  !! hit agreement vs first: {same:.6f}",
                          flush=True)
    for nm in ("primary", "bounce"):
        base = results.get(("v1-k4", nm))
        for variant in VARIANTS:
            r = results.get((variant, nm))
            if r and base:
                print(f"SPEEDUP {nm} {variant}: {r[0] / base[0]:.2f}x",
                      flush=True)


if __name__ == "__main__":
    main()
