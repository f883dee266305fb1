"""Production-wave ABAB: dead-lane compaction / ray sorting re-test.

The r4 measurements that turned SHIMMER_COMPACT and SHIMMER_SORT_RAYS
off ran at the old config (block 2^16, wave_spp 4, wave ~1.1 Mrays/s).
The bench now measures ~0.44-0.6 live-lane occupancy at the current
config (block 2^17, wave_spp 16), so re-test both knobs here: the env
vars are read per trace inside _traverse_raw, so toggling os.environ +
jax.clear_caches() is enough.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    print("devices:", jax.devices(), flush=True)
    x = float(jnp.ones((8, 8)).sum())
    print(f"probe ok ({x})", flush=True)

    import bench as B
    from shimmer_tpu.render import make_wavefront_renderer, pixel_blocks
    from shimmer_tpu.samplers import ZSobolSampler

    scene, cam, film, n_tri = B.build_bench_scene(300000)
    sampler = ZSobolSampler(16, film.resolution)
    blocks, valids = pixel_blocks(film, 1 << 17)
    idx = jnp.arange(16, dtype=jnp.uint32)

    VARIANTS = {
        "off": ("0", "0"),
        "compact": ("0", "1"),
        "sort": ("1", "0"),
    }
    order = ["off", "compact", "sort", "off", "compact", "sort"]
    results = {}
    for pass_i, variant in enumerate(order):
        sortv, compactv = VARIANTS[variant]
        os.environ["SHIMMER_SORT_RAYS"] = sortv
        os.environ["SHIMMER_COMPACT"] = compactv
        jax.clear_caches()
        wave_fn = make_wavefront_renderer(
            scene, cam, film, sampler, max_depth=5, with_stats=True
        )
        state = film.init_state()
        t0 = time.time()
        state, st = wave_fn(state, idx, blocks[0], valids[0])
        jax.block_until_ready(state)
        print(f"[{variant} #{pass_i}] compile+block0: "
              f"{time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        rays = 0.0
        for b in range(1, 5):
            state, st = wave_fn(state, idx, blocks[b], valids[b])
            rays += float(st["rays"])
        jax.block_until_ready(state)
        mr = rays / (time.time() - t0) / 1e6
        mean = float(jnp.mean(film.get_image(state)))
        print(f"[{variant} #{pass_i}] wave: {mr:.3f} Mrays/s "
              f"(img mean {mean:.5f})", flush=True)
        results.setdefault(variant, []).append(mr)
    base = max(results["off"])
    for variant in VARIANTS:
        r = results[variant]
        print(f"WAVE {variant}: best {max(r):.3f} "
              f"({[round(x, 3) for x in r]}) "
              f"speedup {max(r)/base:.3f}x", flush=True)


if __name__ == "__main__":
    main()
