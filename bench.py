"""Headline benchmark: forward path-tracing throughput (Mrays/s/chip).

Ganesha-class stand-in (the reference scenes live in an external repo,
README.md:19-21): a procedurally displaced, subdivided icosphere with a few
hundred thousand triangles, lit by an area light + environment, rendered
with the full path integrator (NEE + MIS + RR) at 1280x720.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = value / 100 (BASELINE.md: >= 100 Mrays/s/chip forward).
Extra keys on the same line: ``bwd_mrays_per_s`` (path-replay
value-and-grad wave, the fwd+bwd half of the north star) and the
traversal self-diagnosis (steps/packet + Mrays/s for coherent primary vs
incoherent bounce batches) so the throughput gap is attributed in the
artifact itself.

Stage breakdown (scene build / BVH / compile / per-wave render) goes to
stderr.  Env knobs: BENCH_TRIS (default 300000), BENCH_SPP (default 16),
BENCH_RES ("WxH", default 1280x720), BENCH_BLOCK (lanes per dispatch,
default 2^17), BENCH_PROFILE (directory -> capture a jax.profiler trace
of one wave), BENCH_ATTRIB=0 / BENCH_BWD=0 (skip those phases).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_T0 = time.time()


def log(msg):
    print(f"# [{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def make_displaced_sphere(n_tris_target: int, seed: int = 0):
    """Subdivided icosahedron with multi-octave sinusoidal displacement."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int64,
    )
    # Subdivide to the smallest 20*4^k >= target: a request is never
    # silently undershot by 4x (VERDICT r3 weak #4 — the old `*4 <=`
    # condition stopped at 82k for a 300k request).
    while faces.shape[0] < n_tris_target:
        # midpoint subdivision (vectorized, dedup via sorted-edge keys)
        e = np.concatenate(
            [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]
        )
        e_sorted = np.sort(e, axis=1)
        keys = e_sorted[:, 0] * (1 << 32) + e_sorted[:, 1]
        _, first, inv = np.unique(keys, return_index=True, return_inverse=True)
        mid_idx = len(verts) + inv
        new_pts = 0.5 * (verts[e_sorted[:, 0]] + verts[e_sorted[:, 1]])
        new_verts = new_pts[first]
        new_verts /= np.linalg.norm(new_verts, axis=1, keepdims=True)
        m01 = mid_idx[: len(faces)]
        m12 = mid_idx[len(faces) : 2 * len(faces)]
        m20 = mid_idx[2 * len(faces) :]
        f = faces
        faces = np.concatenate(
            [
                np.stack([f[:, 0], m01, m20], 1),
                np.stack([f[:, 1], m12, m01], 1),
                np.stack([f[:, 2], m20, m12], 1),
                np.stack([m01, m12, m20], 1),
            ]
        )
        verts = np.concatenate([verts, new_verts])
    # fractal-ish displacement
    p = verts
    disp = (
        0.12 * np.sin(7.0 * p[:, 0]) * np.sin(9.0 * p[:, 1])
        + 0.06 * np.sin(17.0 * p[:, 2] + 1.3) * np.cos(13.0 * p[:, 0])
        + 0.03 * np.sin(31.0 * p[:, 1] + 4.0)
    )
    verts = p * (1.0 + disp[:, None])
    return verts.astype(np.float32), faces.astype(np.int32)


def build_bench_scene(n_tris: int):
    import jax.numpy as jnp

    from shimmer_tpu.cameras import CameraTransform, PerspectiveCamera
    from shimmer_tpu.color.colorspace import get_named_color_space
    from shimmer_tpu.film.filters import BoxFilter
    from shimmer_tpu.film.film import PixelSensor, RgbFilm
    from shimmer_tpu.lights import lights as lt
    from shimmer_tpu.materials import material as mtl
    from shimmer_tpu.ops.transform import Transform
    from shimmer_tpu.scene_builder import build_scene
    from shimmer_tpu.shapes.mesh import TriangleMesh, quad_mesh
    from shimmer_tpu.shapes.triangle import build_triangle_scene
    from shimmer_tpu.spectra.spectrum import ConstantSpectrum

    res_s = os.environ.get("BENCH_RES", "1280x720")
    w, h = (int(x) for x in res_s.split("x"))
    cs = get_named_color_space("srgb")
    ct = CameraTransform(
        Transform.look_at(
            jnp.array([0.0, 0.6, -3.2]),
            jnp.array([0.0, 0.0, 0.0]),
            jnp.array([0.0, 1.0, 0.0]),
        )
    )
    cam = PerspectiveCamera(ct, (w, h), fov=40.0)
    film = RgbFilm((w, h), BoxFilter(), PixelSensor(cs), cs)
    r2w = cam.camera_transform.render_from_world()

    t0 = time.time()
    verts, faces = make_displaced_sphere(n_tris)
    log(f"geometry gen: {time.time()-t0:.1f}s ({faces.shape[0]} tris)")
    t0 = time.time()
    mesh = TriangleMesh(r2w, faces, verts)
    floor = quad_mesh(
        r2w, [-8, -1.3, -8], [8, -1.3, -8], [8, -1.3, 8], [-8, -1.3, 8]
    )
    # emissive quad up high
    lightq = quad_mesh(
        r2w, [-1.0, 4.0, -1.0], [1.0, 4.0, -1.0], [1.0, 4.0, 1.0], [-1.0, 4.0, 1.0]
    )
    meshes = [
        mesh.as_scene_dict(0),
        floor.as_scene_dict(1),
        lightq.as_scene_dict(2, area_light_id=np.array([0, 1], np.int32)),
    ]
    log(f"mesh transform: {time.time()-t0:.1f}s")
    t0 = time.time()
    tris = build_triangle_scene(meshes)
    log(
        f"BVH8 build+pack: {time.time()-t0:.1f}s "
        f"({tris.rows8.shape[0]} rows, stack depth {tris.stack_depth})"
    )
    n_tri_total = int(np.asarray(tris.orig_indices).shape[0])
    t0 = time.time()
    scene = build_scene(
        triangles=tris,
        materials=[
            {"kind": mtl.DIFFUSE, "reflectance": [0.55, 0.45, 0.35]},
            {"kind": mtl.DIFFUSE, "reflectance": [0.4, 0.4, 0.42]},
            {"kind": mtl.DIFFUSE, "reflectance": [0.0, 0.0, 0.0]},
        ],
        lights=[
            {
                "kind": lt.AREA,
                "spectrum": ConstantSpectrum(1.0),
                "scale": 15.0,
                "shape_kind": 1,
                "shape_idx": n_tri_total - 2 + k,
            }
            for k in range(2)
        ]
        + [
            {
                "kind": lt.UNIFORM_INFINITE,
                "spectrum": cs.illuminant,
                "photometric": True,
                "scale": 0.3,
            }
        ],
        render_from_world=r2w,
    )
    log(f"scene tables: {time.time()-t0:.1f}s")
    return scene, cam, film, n_tri_total


def main():
    import jax

    # Persistent compilation cache: repeat bench runs skip the multi-minute
    # XLA compile of the wave program.
    cache_dir = os.environ.get(
        "BENCH_JAX_CACHE", os.path.join(os.path.dirname(__file__), ".jax_cache")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from shimmer_tpu.integrators.path import li_path
    from shimmer_tpu.render import (
        make_wave_renderer,
        make_wavefront_renderer,
        pixel_blocks,
    )
    from shimmer_tpu.samplers import ZSobolSampler
    from shimmer_tpu.film.filters import get_camera_sample

    n_tris = int(os.environ.get("BENCH_TRIS", "300000"))
    spp = int(os.environ.get("BENCH_SPP", "16"))
    # Deeper work pool + wider dispatch amortize the wavefront's drain
    # tail and per-iteration overheads: r4 on-chip sweep measured
    # (block, wave_spp) = (2^16, 4): 0.53 -> (2^17, 16): 1.59 Mrays/s.
    wave_spp = int(os.environ.get("BENCH_WAVE_SPP", "16"))
    max_depth = 5

    scene, cam, film, n_tri_total = build_bench_scene(n_tris)
    w, h = film.resolution
    sampler = ZSobolSampler(spp, (w, h))
    log(
        f"scene ready: {n_tri_total} tris, {w}x{h}, spp={spp}, "
        f"depth={max_depth}, device={jax.devices()[0].platform}"
    )

    block = int(os.environ.get("BENCH_BLOCK", str(1 << 17)))
    megakernel = bool(os.environ.get("BENCH_MEGAKERNEL"))
    if megakernel:
        wave_fn_raw = make_wave_renderer(
            scene, cam, film, sampler, "path", max_depth=max_depth
        )

        def wave_fn(state, idx, px, valid):
            return wave_fn_raw(state, idx, px, valid), None

    else:
        # with_stats: the wave returns its own exact traced-ray count —
        # no separate 69s ray-count probe (VERDICT r2 item 4).
        wave_fn = make_wavefront_renderer(
            scene, cam, film, sampler, max_depth=max_depth, with_stats=True
        )
    blocks, valids = pixel_blocks(film, block)
    n_blocks = blocks.shape[0]

    rays_per_sample = None
    if megakernel:
        # Legacy path: 1-spp probe on one block to estimate rays/sample.
        @jax.jit
        def count_rays(sample_index, pixel_xy, pixel_valid):
            s_state = sampler.start_pixel_sample(pixel_xy, sample_index)
            u_lam, s_state = sampler.get_1d(s_state)
            swl = film.sample_wavelengths(u_lam)
            u_f, s_state = sampler.get_pixel_2d(s_state)
            u_l, s_state = sampler.get_2d(s_state)
            p_film, wt, _ = get_camera_sample(film.filter, pixel_xy, u_f, u_l)
            ray = cam.generate_ray(p_film, u_l)
            _, stats = li_path(
                scene, ray, swl, sampler, s_state, max_depth,
                return_stats=True, alive_mask=pixel_valid,
            )
            return stats["rays"]

        t0 = time.time()
        rays_block0 = float(count_rays(jnp.uint32(0), blocks[0], valids[0]))
        valid0 = float(np.asarray(valids[0]).sum())
        rays_per_sample = rays_block0 / max(valid0, 1.0) * (w * h)
        log(
            f"ray-count probe: {time.time()-t0:.1f}s — "
            f"{rays_per_sample/1e6:.2f}M rays/spp "
            f"({rays_per_sample/(w*h):.2f} rays/pixel)"
        )

    # Warmup (compile) then timed waves.  One device dispatch per
    # (block, wave): bounded program size — the round-1 whole-wave scan
    # program hit device timeouts.
    state = film.init_state()
    idx0 = jnp.arange(wave_spp, dtype=jnp.uint32)
    t0 = time.time()
    state, _stats0 = wave_fn(state, idx0, blocks[0], valids[0])
    jax.block_until_ready(state)
    log(f"wave compile+first block: {time.time()-t0:.1f}s")

    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            state, _ = wave_fn(state, idx0, blocks[1 % n_blocks], valids[1 % n_blocks])
            jax.block_until_ready(state)
        log(f"profiler trace written to {profile_dir}")

    timed_spp = 0
    done = 0
    t0 = time.time()
    first_wave_s = None
    ray_stats = []
    iter_stats = []
    while done < spp:
        n = min(wave_spp, spp - done)
        idx = jnp.arange(done, done + n, dtype=jnp.uint32)
        tw = time.time()
        wave_rays, wave_iters = [], []
        for b in range(n_blocks):
            state, st = wave_fn(state, idx, blocks[b], valids[b])
            if st is not None:
                wave_rays.append(st["rays"])
                wave_iters.append(st["iters"])
        # Force completion by FETCHING data (one round-trip per wave),
        # not block_until_ready: on the axon tunnel the latter
        # intermittently returns before queued dispatches execute
        # (observed: an 8-block wave "timed" at 0.01s with the work
        # completing during the later stats fetch — a ~2000x-inflated
        # headline).  Fetching every queued stats scalar provably waits
        # for every dispatch while keeping the queue async in between.
        ray_stats.extend(float(x) for x in wave_rays)
        iter_stats.extend(float(x) for x in wave_iters)
        jax.block_until_ready(state)
        if first_wave_s is None:
            first_wave_s = time.time() - tw
            log(f"wave of {n} spp x {n_blocks} blocks: {first_wave_s:.2f}s")
        done += n
        timed_spp += n
    render_s = time.time() - t0
    if ray_stats:
        total_rays = float(np.sum(ray_stats))
        log(
            f"traced {total_rays/1e6:.1f}M rays "
            f"({total_rays/(w*h*timed_spp):.2f} rays/pixel-sample)"
        )
        # Live-lane occupancy of the merged trace dispatches: each
        # wavefront iteration traces 2*block lanes (extension + shadow
        # halves); `rays` counts only live lanes.  This is the
        # raw-kernel-vs-production normalizer: raw attribution batches
        # run at occupancy 1.0, the production wave at this value.
        total_iters = float(np.sum(iter_stats))
        occupancy = total_rays / max(total_iters * 2 * block, 1.0)
        log(
            f"wave occupancy: {occupancy:.3f} "
            f"({total_iters:.0f} iterations, 2x{block} lanes each)"
        )
    else:
        total_rays = rays_per_sample * timed_spp
        occupancy = None
    mrays = total_rays / render_s / 1e6

    img = film.get_image(state)
    mean = float(jnp.mean(img))
    assert np.isfinite(mean) and mean > 0, "bench render produced bad image"
    log(f"{timed_spp} spp in {render_s:.2f}s, image mean {mean:.4f}")

    extras = {}

    # --- traversal self-diagnosis: steps + throughput per ray class ---
    if os.environ.get("BENCH_ATTRIB", "1") != "0":
        try:
            extras.update(traversal_attribution(scene, cam, film))
        except Exception as e:  # diagnosis must never sink the headline
            log(f"attribution phase failed: {e!r}")

    # --- Ganesha-scale: 1.3M tris through the HBM-streaming kernel ---
    if os.environ.get("BENCH_STREAM", "1") != "0":
        try:
            extras.update(streaming_benchmark())
        except Exception as e:
            log(f"streaming phase failed: {e!r}")

    # --- backward: path-replay value-and-grad wave (north star fwd+bwd) ---
    if os.environ.get("BENCH_BWD", "1") != "0":
        try:
            extras.update(
                bwd_benchmark(
                    scene, cam, film, sampler, blocks, valids, ray_stats,
                    wave_spp, max_depth, n_blocks,
                )
            )
        except Exception as e:
            log(f"bwd phase failed: {e!r}")

    print(
        json.dumps(
            {
                "metric": "fwd_path_trace_throughput",
                "value": round(mrays, 3),
                "unit": "Mrays/s/chip",
                "vs_baseline": round(mrays / 100.0, 4),
                **(
                    {"wave_occupancy": round(occupancy, 4)}
                    if occupancy is not None
                    else {}
                ),
                **extras,
            },
            default=float,   # numpy scalars in extras
        )
    )


def traversal_attribution(scene, cam, film, n=1 << 17):
    """Time the raw packet traversal on coherent primary vs incoherent
    bounce-like rays, reporting steps/packet so the packet-union factor
    is visible in the artifact (VERDICT r3 weak #1)."""
    import jax
    import jax.numpy as jnp

    from shimmer_tpu.ops.pallas.traverse import K_PACKETS, P
    from shimmer_tpu.shapes.triangle import _traverse_raw, _use_pallas

    tris = scene.triangles
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

    use_pallas = _use_pallas(tris)
    out = {"traversal_backend": "pallas" if use_pallas else "xla",
           "k_packets": K_PACKETS}
    fn = jax.jit(lambda o, d: _traverse_raw(tris, o, d, jnp.inf, False))
    if use_pallas:
        from shimmer_tpu.ops.pallas.traverse import traverse_packets_raw

        # Steps come from the SAME configuration that is timed (the r4
        # numbers mixed a sorted steps-run with an unsorted timing run).
        fn = jax.jit(
            lambda o, d: traverse_packets_raw(
                tris, o, d, jnp.inf, return_steps=True
            )
        )
        fn_steps = fn
    for name, o, d in [
        ("primary", ray.o, ray.d),
        ("bounce", jnp.asarray(pts * 1.05), jnp.asarray(dirs)),
    ]:
        # 3 warmup dispatches: the first timed kernel sequence in a
        # process reads ~7x slow regardless of config (tunnel/executable
        # paging artifact, r4 measurements) — flush it before timing.
        for k in range(3):
            r = fn(o + 1e-6 * k, d)
        float(jnp.sum(r[0]))  # drain queue: data fetch, tunnel-safe
        # Round-trip cost of one fetch on already-computed data — the
        # tunnel adds ~10-20 ms per fetch, comparable to one raw
        # dispatch, so a per-rep fetch would halve the reported rate
        # (observed).  Time the rep batch with ONE end fetch (the TPU
        # stream executes in order, so it waits for all reps) and
        # subtract the measured fetch cost.
        t0 = time.time()
        float(jnp.sum(r[0]))
        fetch_rt = time.time() - t0
        t0 = time.time()
        reps = 6
        for k in range(reps):
            r = fn(o + 1e-5 * k, d)
        float(jnp.sum(r[0]))
        dt = max(time.time() - t0 - fetch_rt, 1e-9) / reps
        out[f"attrib_{name}_mrays_per_s"] = round(n / dt / 1e6, 3)
        if use_pallas:
            steps = np.asarray(r[2]).reshape(-1, P)[:, 0]
            out[f"attrib_{name}_steps_per_packet"] = round(float(steps.mean()), 1)
            gs = steps.reshape(-1, K_PACKETS).max(1).sum()
            out[f"attrib_{name}_ns_per_step"] = round(dt / max(gs, 1) * 1e9, 1)
        log(
            f"attrib {name}: {out[f'attrib_{name}_mrays_per_s']} Mrays/s"
            + (
                f", {out.get(f'attrib_{name}_steps_per_packet')} steps/packet"
                f", {out.get(f'attrib_{name}_ns_per_step')} ns/step"
                if use_pallas
                else ""
            )
        )
    return out


def streaming_benchmark(n_tris=1310720, wave_spp=16):
    """One wave on a 1.3M-triangle scene (BASELINE config #4 class):
    the node table exceeds the VMEM budget, so this exercises the
    HBM-streaming Pallas traversal end-to-end on hardware."""
    import jax
    import jax.numpy as jnp

    from shimmer_tpu.ops.pallas.traverse import VMEM_TABLE_BYTES
    from shimmer_tpu.render import make_wavefront_renderer, pixel_blocks
    from shimmer_tpu.samplers import ZSobolSampler

    scene, cam, film, n_tri = build_bench_scene(n_tris)
    tiles = scene.triangles.tiles8.shape[0]
    assert tiles * 4096 > VMEM_TABLE_BYTES, "scene too small to stream"
    w, h = film.resolution
    sampler = ZSobolSampler(wave_spp, (w, h))
    wave_fn = make_wavefront_renderer(
        scene, cam, film, sampler, max_depth=5, with_stats=True
    )
    blocks, valids = pixel_blocks(film, 1 << 17)
    state = film.init_state()
    idx = jnp.arange(wave_spp, dtype=jnp.uint32)
    t0 = time.time()
    state, st = wave_fn(state, idx, blocks[0], valids[0])
    jax.block_until_ready(state)
    log(f"streaming 1.3M compile+block0: {time.time()-t0:.1f}s")
    t0 = time.time()
    rays = 0.0
    reps = 2
    for b in range(1, 1 + reps):
        state, st = wave_fn(state, idx, blocks[b], valids[b])
        rays += float(st["rays"])
    jax.block_until_ready(state)
    dt = (time.time() - t0) / reps
    mr = rays / reps / dt / 1e6
    mean = float(jnp.mean(film.get_image(state)))
    assert np.isfinite(mean) and mean > 0, "streaming render bad image"
    log(
        f"streaming 1.3M tris ({tiles} tiles, VMEM budget "
        f"{VMEM_TABLE_BYTES >> 20}MB): {mr:.3f} Mrays/s"
    )
    return {"ganesha_1p3m_mrays_per_s": round(mr, 3)}


def bwd_benchmark(
    scene, cam, film, sampler, blocks, valids, ray_stats, wave_spp,
    max_depth, n_blocks,
):
    """Path-replay value-and-grad of one wave block w.r.t. the material
    table: the fwd+bwd Mrays/s number BASELINE's north star asks for."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from shimmer_tpu.render import make_replay_wavefront_renderer

    replay = make_replay_wavefront_renderer(
        scene, cam, film, sampler, max_depth=max_depth
    )
    idx = jnp.arange(wave_spp, dtype=jnp.uint32)
    state0 = film.init_state()

    def loss(refl):
        mats = dataclasses.replace(scene.materials, reflectance=refl)
        sc = dataclasses.replace(scene, materials=mats)
        fs = replay(sc, state0, idx, blocks[0], valids[0])
        return jnp.sum(fs.rgb_sum)

    vg = jax.jit(jax.value_and_grad(loss))
    refl = scene.materials.reflectance
    t0 = time.time()
    v, g = vg(refl)
    jax.block_until_ready(g)
    log(f"bwd compile+first: {time.time()-t0:.1f}s")
    # Warmups past the first-dispatch timing artifact (same reason as
    # the attribution phase; bwd previously swung 2x run-to-run).
    for k in range(2):
        v, g = vg(refl * (1.0 + 1e-6 * (50 + k)))
        float(v)    # data fetch: block_until_ready is unreliable on the
    t0 = time.time()  # tunnel (see the fwd wave loop note)
    reps = 2
    for k in range(reps):
        v, g = vg(refl * (1.0 + 1e-6 * k))
        float(v)
    dt = (time.time() - t0) / reps
    assert np.isfinite(float(v)) and np.all(np.isfinite(np.asarray(g)))
    # Rays in this wave block: measured by the fwd phase (per block-wave).
    if ray_stats:
        rays_block = float(np.asarray(ray_stats[0]))
    else:
        w, h = film.resolution
        rays_block = 2.4 * wave_spp * blocks.shape[1]
    mrays = rays_block / dt / 1e6
    log(
        f"bwd wave (value+grad, {rays_block/1e6:.2f}M rays): {dt:.2f}s "
        f"= {mrays:.3f} Mrays/s fwd+bwd"
    )
    return {"bwd_mrays_per_s": round(mrays, 3)}


if __name__ == "__main__":
    main()
