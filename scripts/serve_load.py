"""Serve under concurrent load (VERDICT r2 item 8): drive the resident
server with mixed concurrent clients at the 19B w4a8 flagship geometry and
report throughput + latency percentiles.

Phases (sequential, one device):
  A. warmup      — compile the two request shapes once (server --warmup role)
  B. coalescing  — max_batch=2 service: 2x same-shape clients arriving inside
                   the batch window must coalesce into one batched denoise,
                   while a third, different-shape client runs solo
  C. lora        — same service: concurrent base + hot-swapped-LoRA clients
                   (different batch keys -> separate groups, shared base HBM)
  D. streaming   — max_batch=1 service over the SAME ModelBundle: one NDJSON
                   streaming client; first-event latency + event cadence

Models are synthetic weights in the real 19B w4a8 layout (timing depends on
shapes/dtypes only — same substitution as bench.py / e2e_config*.py).

    python scripts/serve_load.py                 # full, on the TPU
    python scripts/serve_load.py --tiny --cpu    # plumbing smoke
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import threading
import time
import urllib.request

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _post(url: str, payload: dict, timeout: float = 3600.0) -> dict:
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), headers={"Content-Type": "application/json"}
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return json.loads(r.read())
    except urllib.error.HTTPError as e:
        body = e.read().decode(errors="replace")[:2000]
        raise RuntimeError(f"HTTP {e.code} from server: {body}") from e


def _post_stream(url: str, payload: dict, timeout: float = 3600.0):
    """POST with stream=true; returns (events, first_event_latency_s)."""
    req = urllib.request.Request(
        url, data=json.dumps(dict(payload, stream=True)).encode(),
        headers={"Content-Type": "application/json"},
    )
    t0 = time.time()
    first = None
    events = []
    with urllib.request.urlopen(req, timeout=timeout) as r:
        for line in r:
            if not line.strip():
                continue
            if first is None:
                first = time.time() - t0
            events.append(json.loads(line))
    return events, first


def _pcts(xs):
    xs = sorted(xs)
    if not xs:
        return {}
    return {
        "p50": xs[len(xs) // 2],
        "p95": xs[min(len(xs) - 1, int(len(xs) * 0.95))],
        "max": xs[-1],
    }


def main() -> None:
    import numpy as np

    import jax

    tiny = "--tiny" in sys.argv
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mlx_video_tpu.cli.serve import GenerationService, serve
    from mlx_video_tpu.config import (
        LTXModelConfig,
        LTXModelType,
        LTXRopeType,
        tiny_test_config,
    )
    from mlx_video_tpu.io.safetensors import save_safetensors as save_st
    from mlx_video_tpu.models.ltx.model import init_ltx_params
    from mlx_video_tpu.models.ltx.upsampler import init_latent_upsampler
    from mlx_video_tpu.models.ltx.video_vae.decoder import DecoderConfig, init_video_decoder
    from mlx_video_tpu.pipelines.generate import ModelBundle, TextConditioning

    t_start = time.time()
    out_dir = "/tmp/serve_load_out"
    lora_dir = os.path.join(out_dir, "adapters")
    os.makedirs(lora_dir, exist_ok=True)
    rng = np.random.default_rng(0)

    if tiny:
        config = tiny_test_config(LTXModelType.VideoOnly)
        t_params = init_ltx_params(jax.random.key(0), config, dtype=jnp.float32)
        dec_cfg = DecoderConfig(
            in_channels=config.in_channels, base_channels=32,
            num_layers_per_block=1, num_upsamples=3, patch_size=4,
        )
        dtype = jnp.float32
        req_a = {"height": 64, "width": 64, "num_frames": 9,
                 "stage1_steps": 1, "stage2_steps": 1, "tiling": "none"}
        req_b = dict(req_a, height=96, width=96)
        steps_info = "tiny"
    else:
        from bench import synth_q4_params

        # Real 19B geometry (bench.py flagship), w4a8 — fits one v5e chip.
        config = LTXModelConfig(
            model_type=LTXModelType.VideoOnly,
            num_attention_heads=32,
            attention_head_dim=128,
            in_channels=128,
            out_channels=128,
            num_layers=48,
            cross_attention_dim=4096,
            caption_channels=3840,
            rope_type=LTXRopeType.SPLIT,
        )
        t_params = synth_q4_params(config)
        dec_cfg = DecoderConfig()
        dtype = jnp.bfloat16
        # 512^2x33 flagship request; 8-step distilled schedule (the
        # reference's distilled default), auto tiling for the 1024-ch decoder
        req_a = {"height": 512, "width": 512, "num_frames": 33,
                 "stage1_steps": 8, "stage2_steps": 3}
        req_b = dict(req_a, height=384, width=384, num_frames=25)
        steps_info = "19B w4a8, 8+3 steps"

    models = ModelBundle(
        transformer_params=t_params,
        transformer_config=config,
        vae_decoder_params=init_video_decoder(jax.random.key(1), dec_cfg, dtype=dtype),
        vae_decoder_config=dec_cfg,
        upsampler_params=init_latent_upsampler(
            jax.random.key(2),
            in_channels=config.in_channels,
            mid_channels=32 if tiny else 1024,
            num_blocks=1 if tiny else 4,
            dtype=dtype,
        ),
    )
    text = TextConditioning(
        video_embeddings=jnp.asarray(
            rng.normal(size=(1, 8, config.caption_channels)).astype(np.float32)
        )
    )
    # rank-8 adapter over attn1.to_q of block 0 (19B inner_dim) — enough to
    # change outputs and force a distinct batch key, negligible HBM.
    save_st(os.path.join(lora_dir, "style.safetensors"), {
        "diffusion_model.transformer_blocks.0.attn1.to_q.lora_A.weight":
            rng.normal(size=(8, config.inner_dim)).astype(np.float32) * 0.1,
        "diffusion_model.transformer_blocks.0.attn1.to_q.lora_B.weight":
            rng.normal(size=(config.inner_dim, 8)).astype(np.float32) * 0.1,
    })

    svc = GenerationService(
        models, default_text=text, output_dir=out_dir, dtype=dtype,
        max_batch=2, batch_window=0.25, lora_dir=lora_dir,
        # 19B + full 1024-ch decoder + upsampler resident OOMs one v5e
        # (measured r5); aux_park is the single-chip serving memory plan,
        # and LoRA slots keep hot-swap on ONE compiled denoise program (a
        # second 19B scan program beside the resident one also OOM'd).
        aux_park=not tiny,
        lora_slot_rank=16,
    )
    httpd = serve(svc, host="127.0.0.1", port=0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}/generate"
    base = {"prompt": "load test", "seed": 7}

    # -- A: warmup (both shapes + batched-pair shape compile once) ----------
    t0 = time.time()
    _post(url, dict(base, **req_a))
    warm_a = time.time() - t0
    t0 = time.time()
    _post(url, dict(base, **req_b))
    warm_b = time.time() - t0
    print(f"[warmup] shape_a={warm_a:.1f}s shape_b={warm_b:.1f}s ({steps_info})", flush=True)

    # -- B: coalescing under concurrency ------------------------------------
    results: dict = {}

    def client(name, payload):
        t0 = time.time()
        results[name] = (_post(url, payload), time.time() - t0)

    batches_before = svc.batches_run
    served_before = svc.requests_served
    t_phase = time.time()
    threads = [
        threading.Thread(target=client, args=(f"a{i}", dict(base, seed=i, **req_a)))
        for i in range(2)
    ] + [threading.Thread(target=client, args=("b0", dict(base, seed=9, **req_b)))]
    for t in threads:
        t.start()
        time.sleep(0.02)  # arrive inside the batch window
    for t in threads:
        t.join()
    wall_b = time.time() - t_phase
    lat = [results[k][1] for k in ("a0", "a1", "b0")]
    batches = svc.batches_run - batches_before
    served = svc.requests_served - served_before
    coalesced = batches < served
    print(f"[coalesce] 3 reqs in {batches} batches wall={wall_b:.1f}s "
          f"lat={[f'{x:.1f}' for x in lat]} coalesced={coalesced}", flush=True)

    # -- C: LoRA hot-swap under concurrency ---------------------------------
    t_phase = time.time()
    threads = [
        threading.Thread(target=client, args=("base0", dict(base, seed=11, **req_a))),
        threading.Thread(target=client, args=(
            "lora0", dict(base, seed=11, lora="style.safetensors", **req_a))),
    ]
    for t in threads:
        t.start()
        time.sleep(0.02)
    for t in threads:
        t.join()
    wall_c = time.time() - t_phase
    with open(results["base0"][0]["path"], "rb") as f:
        base_bytes = f.read()
    with open(results["lora0"][0]["path"], "rb") as f:
        lora_bytes = f.read()
    lora_differs = base_bytes != lora_bytes
    print(f"[lora] base={results['base0'][1]:.1f}s lora={results['lora0'][1]:.1f}s "
          f"wall={wall_c:.1f}s differs={lora_differs}", flush=True)

    # -- sustained mixed load: 8 requests, 4 concurrent clients -------------
    reqs = [dict(base, seed=20 + i, **(req_a if i % 4 else req_b)) for i in range(8)]
    lats: list = []
    idx_lock = threading.Lock()
    idx = [0]

    def worker():
        while True:
            with idx_lock:
                if idx[0] >= len(reqs):
                    return
                my = reqs[idx[0]]
                idx[0] += 1
            t0 = time.time()
            _post(url, my)
            lats.append(time.time() - t0)

    t_phase = time.time()
    workers = [threading.Thread(target=worker) for _ in range(4)]
    for t in workers:
        t.start()
    for t in workers:
        t.join()
    wall_sustained = time.time() - t_phase
    p = _pcts(lats)
    thru = len(reqs) / wall_sustained
    print(f"[sustained] {len(reqs)} reqs wall={wall_sustained:.1f}s "
          f"thru={thru:.3f} req/s p50={p['p50']:.1f}s p95={p['p95']:.1f}s", flush=True)
    httpd.shutdown()

    # -- D: streaming client (max_batch=1 service, same bundle) -------------
    svc2 = GenerationService(
        models, default_text=text, output_dir=out_dir, dtype=dtype, max_batch=1,
        aux_park=not tiny,
    )
    httpd2 = serve(svc2, host="127.0.0.1", port=0)
    threading.Thread(target=httpd2.serve_forever, daemon=True).start()
    url2 = f"http://127.0.0.1:{httpd2.server_address[1]}/generate"
    events, first_ev = _post_stream(url2, dict(base, seed=31, **req_a))
    kinds = [e.get("kind") for e in events]
    n_steps = sum(1 for k in kinds if k == "denoise_step")
    ok_stream = kinds[-1] == "result" and n_steps > 0
    print(f"[stream] events={len(events)} steps={n_steps} first_event={first_ev:.2f}s "
          f"final={kinds[-1]} ok={ok_stream}", flush=True)
    httpd2.shutdown()

    report = {
        "metric": "serve_load_p50_latency",
        "value": round(p["p50"], 2),
        "unit": "s",
        "mode": steps_info,
        "warmup_s": [round(warm_a, 1), round(warm_b, 1)],
        "coalesced": bool(coalesced),
        "lora_differs": bool(lora_differs),
        "sustained": {"requests": len(reqs), "wall_s": round(wall_sustained, 1),
                      "req_per_s": round(thru, 3), **{k: round(v, 2) for k, v in p.items()}},
        "stream_first_event_s": round(first_ev, 2),
        "stream_ok": bool(ok_stream),
        "total_wall_s": round(time.time() - t_start, 1),
    }
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
