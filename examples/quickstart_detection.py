#!/usr/bin/env python
"""Detection + association quickstart — the script twin of the reference's
``Examples/tutorial_run_genie.ipynb``, self-contained on synthetic data
(the notebook's real pick files need an FDSN download; no egress here).

Walk-through:
  1. build a small domain (stations, kmeans-style source grids, travel times),
  2. train the Detector on on-device synthetic pick timelines,
  3. run the continuous-window inference pipeline on a fresh timeline,
  4. score detections against the planted events with the bipartite matcher.

~5 min on CPU at the default 300 steps (the model is undertrained at that
budget — expect partial recall; ≳3000 steps reaches F1 ≈ 0.86, see
RESULTS.md). On TPU: ~0.1 s/step.

    JAX_PLATFORMS=cpu python examples/quickstart_detection.py --steps 300
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--thresh", type=float, default=0.2)
    args = ap.parse_args()

    import jax
    from genie_tpu.calibration.corrections import matched_catalog_stats
    from genie_tpu.infer.pipeline import InferencePipeline
    from genie_tpu.models.detector import Detector
    from genie_tpu.synth.generator import synthesize_timeline
    from genie_tpu.train.trainer import init_train_state, make_train_step

    # 1. domain — reuse the evaluation harness's builder (16 stations,
    #    two 120-node grids, homogeneous travel times)
    from eval_synthetic import build

    class A:  # the builder's knobs
        n_sta, n_src, n_batch, thresh = 16, 120, 4, args.thresh

    cfg, ctx, tt = build(A)
    print(f"domain: {ctx.sta_cart.shape[0]} stations, "
          f"{ctx.grids_cart.shape[0]}x{ctx.grids_cart.shape[1]} source grids")

    # 2. train
    key = jax.random.PRNGKey(0)
    model = Detector(src_chunk=16)
    state = init_train_state(model, cfg, ctx, tt.from_cart, key)
    step_fn, _ = make_train_step(model, cfg, ctx, tt.from_cart)
    t0 = time.time()
    for i in range(args.steps):
        key, k = jax.random.split(key)
        state, metrics = step_fn(state, k)
        if i % 100 == 0:
            print(f"  step {i} loss {float(metrics['loss']):.5f}")
    print(f"trained {args.steps} steps in {time.time()-t0:.0f}s")

    # 3. synthesize a fresh 30-minute pick timeline and process it
    cfg.synth.T = 1800.0
    tl = jax.jit(lambda k: synthesize_timeline(
        k, cfg.synth, ctx.sta_cart, tt.from_cart, ctx.scale_cart,
        ctx.offset_cart, (ctx.offset_cart[2], ctx.offset_cart[2] + ctx.scale_cart[2]),
        n_sta_real=ctx.sta_cart.shape[0]))(jax.random.PRNGKey(99))
    pm = np.asarray(tl.pick_mask)
    pick_t, pick_sta = np.asarray(tl.pick_t)[pm], np.asarray(tl.pick_sta)[pm]
    pick_ph = np.asarray(tl.pick_phase)[pm].astype(np.float32)
    print(f"timeline: {pm.sum()} picks, {int(np.asarray(tl.ev_mask).sum())} events")

    pipe = InferencePipeline(model, state.params, cfg, ctx, tt.from_cart)
    events = pipe.process(pick_t, pick_sta, pick_ph, 0.0, cfg.synth.T)
    print(f"pipeline detected {len(events)} events")
    for ev in events[:10]:
        print(f"  t={ev.time:7.1f}s pos=({ev.pos_cart[0]/1e3:+6.1f}, "
              f"{ev.pos_cart[1]/1e3:+6.1f}, {ev.pos_cart[2]/1e3:+6.1f}) km "
              f"score {ev.score:.2f} picks {int(ev.n_picks)}")

    # 4. score against the planted events
    ev_mask = np.asarray(tl.ev_mask)
    true_srcs = np.concatenate((np.asarray(tl.ev_pos_cart)[ev_mask],
                                np.asarray(tl.ev_time)[ev_mask][:, None]), 1)
    det = np.array([[*ev.pos_cart, ev.time] for ev in events]).reshape(-1, 4)
    stats = matched_catalog_stats(det, true_srcs, sig_x=25e3, sig_t=10.0)
    print(f"matched {stats['n_matched']}/{len(true_srcs)} planted events "
          f"(detection rate {stats['detection_rate']:.2f})")


if __name__ == "__main__":
    main()
