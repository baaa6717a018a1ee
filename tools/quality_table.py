"""Quality-per-cost table for the GI modes (VERDICT r4 item 5).

Renders each pipeline against the stored float oracle
(resources/oracle_atrium_192x108.npz and, when present, the v2 oracles) on
the CPU platform, reports the perceptual metric used by
tests/test_ground_truth.py (AgX display, 4x4 block means: mean |d| and
brightness ratio), and joins the measured on-chip frame_ms from
BENCH_DETAILS.json. Output: a markdown table on stdout (pasted into
docs/QUALITY.md).

  python tools/quality_table.py [--frames 8]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse, json

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402


def tonemap_blocks(radiance, block=4):
    from raytracer3_tpu.ops import tonemap

    disp = np.asarray(tonemap.agx_tonemap(jnp.asarray(radiance), look="punchy"))
    return block_means(disp, block)


def ssim(a, b, c1=0.01**2, c2=0.03**2, win=7):
    """Mean SSIM over a luminance image pair in [0,1] (uniform window —
    the standard Wang et al. formula with a box filter; no scipy in the
    image)."""
    def lum(x):
        return 0.2126 * x[..., 0] + 0.7152 * x[..., 1] + 0.0722 * x[..., 2]

    x, y = lum(a).astype(np.float64), lum(b).astype(np.float64)

    def boxf(img):
        # Uniform win x win filter via cumsum (valid region).
        c = np.cumsum(np.cumsum(img, axis=0), axis=1)
        c = np.pad(c, ((1, 0), (1, 0)))
        return (
            c[win:, win:] - c[:-win, win:] - c[win:, :-win] + c[:-win, :-win]
        ) / (win * win)

    mx, my = boxf(x), boxf(y)
    mxx, myy, mxy = boxf(x * x), boxf(y * y), boxf(x * y)
    vx = np.maximum(mxx - mx * mx, 0)
    vy = np.maximum(myy - my * my, 0)
    cxy = mxy - mx * my
    num = (2 * mx * my + c1) * (2 * cxy + c2)
    den = (mx * mx + my * my + c1) * (vx + vy + c2)
    return float(np.mean(num / den))


def block_means(disp, block=4):
    h, w = disp.shape[0] // block, disp.shape[1] // block
    return disp[: h * block, : w * block].reshape(
        h, block, w, block, 3
    ).mean(axis=(1, 3))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--oracle", default="resources/oracle_atrium_192x108.npz")
    args = ap.parse_args()

    from raytracer3_tpu.ops import intersect as isect_mod
    from raytracer3_tpu.render import pipelines
    from raytracer3_tpu.scene import procedural
    from raytracer3_tpu.utils.config import RenderSettings

    z = np.load(args.oracle)
    oracle, detail = z["radiance"], int(z["detail"])
    h, w = oracle.shape[:2]
    scene, tris = procedural.atrium_scene(detail=detail, return_host=True)
    cam = procedural.atrium_camera(aspect=w / h)
    backend = isect_mod.brute_backend(scene=scene)
    b_ref = tonemap_blocks(oracle)
    from raytracer3_tpu.ops import tonemap as tonemap_mod

    ref_disp = np.asarray(
        tonemap_mod.agx_tonemap(jnp.asarray(oracle), look="punchy")
    )

    # On-chip costs from the committed bench record (720p rows — the
    # resolutions quality is judged at here are oracle-sized; ms is reported
    # at the production resolution the mode actually runs at).
    ms = {}
    try:
        for r in json.load(open("BENCH_DETAILS.json")):
            ms[r.get("config", "?")] = r.get("frame_ms")
    except Exception:
        pass

    rows = []
    modes = [
        ("probe_gi", pipelines.probe_gi_pipeline, {}),
        ("probe_gi_nofill", pipelines.probe_gi_pipeline,
         {"probe_sh_fill": False}),
        ("probe_gi_b2", pipelines.probe_gi_pipeline, {"probe_bounces": 2}),
        ("probe_gi_split2", pipelines.probe_gi_pipeline,
         {"probe_texel_splits": 2}),
        # Equal-WALL-TIME comparison for the amortized mode: at the 1080p
        # production cost ratio (214 vs 308.6 ms/frame) split2 runs ~1.44x
        # the frames in the same time budget -> 12 frames vs the 8 above.
        ("probe_gi_split2_ewt", pipelines.probe_gi_pipeline,
         {"probe_texel_splits": 2, "_frames": 12}),
        # Stochastic 2nd-bounce amortization (probe_bounce2_splits): each
        # texel traces bounce 2 with prob 1/4, weighted 4x — unbiased.
        ("probe_gi_b2k4", pipelines.probe_gi_pipeline,
         {"probe_bounces": 2, "probe_bounce2_splits": 4}),
        ("probe_gi_b2k4_split2", pipelines.probe_gi_pipeline,
         {"probe_bounces": 2, "probe_bounce2_splits": 4,
          "probe_texel_splits": 2, "_frames": 16}),
        ("hybrid_gi", pipelines.hybrid_gi_pipeline, {}),
        ("hybrid_gi_b2", pipelines.hybrid_gi_pipeline, {"probe_bounces": 2}),
    ]
    for name, factory, skw in modes:
        skw = dict(skw)
        n_frames = skw.pop("_frames", args.frames)
        settings = RenderSettings(
            width=w, height=h, bounces=1, samples=1,
            probe_spacing=12, probe_res=8, **skw,
        )
        step, init_state = factory(scene, settings, backend=backend)
        state = init_state()
        disp = None
        for i in range(n_frames):
            disp, state = step(state, cam=cam, frame_index=jnp.uint32(i))
        d_full = np.asarray(disp)
        a = block_means(d_full)
        diff = np.abs(a - b_ref)
        rows.append(
            dict(
                mode=name,
                mean_block_diff=round(float(diff.mean()), 4),
                p99_block_diff=round(float(np.percentile(diff, 99)), 4),
                brightness_ratio=round(float(a.mean() / b_ref.mean()), 3),
                ssim=round(ssim(d_full, ref_disp), 4),
            )
        )
        print(json.dumps(rows[-1]), file=sys.stderr, flush=True)

    bench_key = {
        "probe_gi": "sponza720_probe_gi",
        "hybrid_gi": "sponza720_hybrid_gi",
    }
    print("\n| mode | mean block diff | p99 | brightness vs oracle | on-chip ms (sponza720) |")
    print("|---|---|---|---|---|")
    for r in rows:
        k = bench_key.get(r["mode"])
        cost = ms.get(k, "—") if k else "—"
        print(
            f"| {r['mode']} | {r['mean_block_diff']} | {r['p99_block_diff']} "
            f"| {r['brightness_ratio']} | {cost} |"
        )


if __name__ == "__main__":
    main()
