"""Latent precompute tool: videos -> latents, prompts -> embeddings.

Behavioral spec: reference mlx_video/mlx_trainer/precompute.py:23-391:
resolution buckets "WxHxF;..." with nearest-bucket selection (relative
delta score), frame trim / last-frame pad, scale-and-center-crop, VAE
encode, text-embedding precompute, optional audio mel latents; output
layout matches the trainer's PrecomputedDataset directories.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

Bucket = Tuple[int, int, int]  # (W, H, F)


def parse_buckets(spec: str) -> List[Bucket]:
    """'WxHxF;WxHxF' -> [(W, H, F), ...] (reference: precompute.py:232, 280-289)."""
    buckets = []
    for part in spec.split(";"):
        part = part.strip()
        if not part:
            continue
        w, h, f = (int(x) for x in part.lower().split("x"))
        buckets.append((w, h, f))
    if not buckets:
        raise ValueError(f"No buckets parsed from {spec!r}")
    return buckets


def bucket_score(frames: int, height: int, width: int, bucket: Bucket) -> float:
    """Relative-delta distance (reference: precompute.py:62-68)."""
    w, h, f = bucket
    return (
        abs(frames - f) / max(f, 1)
        + abs(height - h) / max(h, 1)
        + abs(width - w) / max(w, 1)
    )


def select_bucket(frames: np.ndarray, buckets: List[Bucket]) -> Bucket:
    """Nearest bucket for an (F, H, W, C) clip (reference: precompute.py:71-82)."""
    f, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
    return min(buckets, key=lambda b: bucket_score(f, h, w, b))


def match_frame_count(frames: np.ndarray, target_f: int) -> np.ndarray:
    """Trim, or pad by repeating the last frame (reference: precompute.py:85-92)."""
    if frames.shape[0] >= target_f:
        return frames[:target_f]
    pad = target_f - frames.shape[0]
    return np.concatenate([frames, np.repeat(frames[-1:], pad, axis=0)], axis=0)


def resize_and_center_crop(frames: np.ndarray, target_h: int, target_w: int) -> np.ndarray:
    """Cover-scale then center crop (reference: precompute.py:95-107)."""
    if frames.shape[1] == target_h and frames.shape[2] == target_w:
        return frames
    import cv2

    h, w = frames.shape[1], frames.shape[2]
    scale = max(target_w / float(w), target_h / float(h))
    new_w, new_h = int(round(w * scale)), int(round(h * scale))
    resized = np.stack(
        [cv2.resize(f, (new_w, new_h), interpolation=cv2.INTER_AREA) for f in frames]
    )
    sx = max((new_w - target_w) // 2, 0)
    sy = max((new_h - target_h) // 2, 0)
    return resized[:, sy : sy + target_h, sx : sx + target_w]


def fit_to_bucket(frames: np.ndarray, bucket: Bucket) -> np.ndarray:
    w, h, f = bucket
    frames = match_frame_count(frames, f)
    return resize_and_center_crop(frames, h, w)


def precompute_dataset(
    videos: List[Path],
    output_root: Path,
    encode_fn: Callable[[np.ndarray], np.ndarray],
    text_encode_fn: Optional[Callable[[str], Dict[str, np.ndarray]]] = None,
    prompts: Optional[Dict[str, str]] = None,
    buckets: Optional[List[Bucket]] = None,
    audio_encode_fn: Optional[Callable[[Path], Optional[np.ndarray]]] = None,
    reference_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    fps: float = 24.0,
    frame_cap: Optional[int] = None,
    caption_fn: Optional[Callable[[Path], str]] = None,
    reference_dir: Optional[Path] = None,
) -> int:
    """Encode clips into the trainer's directory layout
    (reference: precompute.py:218-391). Returns the number of clips written.

    encode_fn: (1, 3, F, H, W) [-1,1] -> (1, C, f, h, w) latents.
    text_encode_fn: prompt -> {"video_prompt_embeds", ...}.
    reference_fn: frames [0,1] -> reference frames (e.g. edge maps) for
    IC-LoRA training.
    """
    from mlx_video_tpu.io.media import load_video, prepare_video_for_encoding
    from mlx_video_tpu.io.safetensors import save_safetensors

    out = Path(output_root)
    (out / "latents").mkdir(parents=True, exist_ok=True)
    (out / "conditions").mkdir(exist_ok=True)
    if audio_encode_fn is not None:
        (out / "audio_latents").mkdir(exist_ok=True)
    if reference_fn is not None:
        (out / "reference_latents").mkdir(exist_ok=True)

    if reference_dir is not None:
        (out / "reference_latents").mkdir(exist_ok=True)

    count = 0
    for video_path in videos:
        frames = load_video(video_path, frame_cap=frame_cap)  # (F, H, W, 3) in [0, 1]
        if buckets:
            frames = fit_to_bucket(frames, select_bucket(frames, buckets))
        # enforce 1 + 8k frames
        f = frames.shape[0]
        valid_f = max(((f - 1) // 8) * 8 + 1, 1)
        frames = frames[:valid_f]

        tensor = prepare_video_for_encoding(
            frames, frames.shape[1], frames.shape[2]
        ).astype(np.float32)
        latents = np.asarray(encode_fn(tensor), dtype=np.float32)[0]

        stem = video_path.stem
        save_safetensors(
            out / "latents" / f"latent_{stem}.safetensors",
            {
                "latents": latents,
                "num_frames": np.array([latents.shape[1]], np.int32),
                "height": np.array([latents.shape[2]], np.int32),
                "width": np.array([latents.shape[3]], np.int32),
                "fps": np.array([fps], np.float32),
            },
        )

        prompt = (prompts or {}).get(stem, "")
        if not prompt and caption_fn is not None:
            prompt = caption_fn(video_path)
        if text_encode_fn is not None:
            cond = {k: np.asarray(v) for k, v in text_encode_fn(prompt).items()}
        else:
            cond = {"prompt": np.frombuffer(prompt.encode() or b"\x00", dtype=np.uint8)}
        save_safetensors(out / "conditions" / f"condition_{stem}.safetensors", cond)

        if audio_encode_fn is not None:
            audio_lat = audio_encode_fn(video_path)
            if audio_lat is not None:
                # Either a bare latent array or a full payload dict
                # (latents + num_time_steps/frequency_bins/duration,
                # reference: precompute.py:383-389).
                if not isinstance(audio_lat, dict):
                    audio_lat = {"latents": np.asarray(audio_lat, np.float32)}
                save_safetensors(
                    out / "audio_latents" / f"latent_{stem}.safetensors", audio_lat
                )
        ref_frames = None
        if reference_dir is not None:
            ref_path = Path(reference_dir) / video_path.name
            if ref_path.exists():
                # Conform the reference clip to the TARGET's final geometry
                # (bucketed frames/height/width): reference latents must
                # stack against target latents in a batch, and a short ref
                # clip must still honor the 1+8k frame contract.
                ref_frames = resize_and_center_crop(
                    match_frame_count(load_video(ref_path, frame_cap=frame_cap), valid_f),
                    frames.shape[1], frames.shape[2],
                )
        elif reference_fn is not None:
            ref_frames = reference_fn(frames)
        if ref_frames is not None:
            ref_tensor = prepare_video_for_encoding(
                ref_frames, frames.shape[1], frames.shape[2]
            ).astype(np.float32)
            ref_lat = np.asarray(encode_fn(ref_tensor), np.float32)[0]
            save_safetensors(
                out / "reference_latents" / f"latent_{stem}.safetensors",
                {
                    "latents": ref_lat,
                    "num_frames": np.array([ref_lat.shape[1]], np.int32),
                    "height": np.array([ref_lat.shape[2]], np.int32),
                    "width": np.array([ref_lat.shape[3]], np.int32),
                    "fps": np.array([fps], np.float32),
                },
            )
        count += 1
    return count


def extract_audio_pcm(
    path: Path, sample_rate: int, channels: int = 2
) -> Optional[Tuple[np.ndarray, int]]:
    """Extract PCM via ffmpeg: (waveform (channels, samples) in [-1, 1], rate),
    or None when the clip has no audio track (reference: precompute.py:192-215)."""
    import subprocess

    cmd = [
        "ffmpeg", "-y", "-i", str(path), "-vn",
        "-ac", str(channels), "-ar", str(sample_rate), "-f", "s16le", "-",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True)
    except FileNotFoundError:
        return None
    if proc.returncode != 0 or not proc.stdout:
        return None
    data = np.frombuffer(proc.stdout, dtype=np.int16)
    if data.size == 0:
        return None
    waveform = data.reshape(-1, channels).T.astype(np.float32) / 32768.0
    return waveform, sample_rate


def make_audio_encode_fn(model_path: Path, dtype=None) -> Callable[[Path], Optional[dict]]:
    """Build video-file -> audio-latent-payload encoder: ffmpeg PCM extract ->
    log-mel (AudioProcessor) -> AudioEncoder -> normalized latents
    (reference: precompute.py:131-190, 366-389)."""
    import jax
    import jax.numpy as jnp

    from mlx_video_tpu.io import vae_weights
    from mlx_video_tpu.models.ltx.audio_vae.audio_vae import (
        AudioVAEConfig,
        audio_encoder_apply,
        init_audio_encoder,
    )
    from mlx_video_tpu.models.ltx.audio_vae.processing import AudioProcessor

    dtype = dtype or jnp.bfloat16
    cfg = AudioVAEConfig()
    params = init_audio_encoder(jax.random.key(0), cfg, dtype=dtype)
    audio_file = model_path / "audio_vae" / "diffusion_pytorch_model.safetensors"
    if not audio_file.exists():
        unified = model_path / "model.safetensors"
        if not unified.exists():
            raise FileNotFoundError(f"No audio VAE weights under {model_path}")
        audio_file = unified
    vae_weights.load_audio_vae_weights(audio_file, params, None, dtype=dtype)
    processor = AudioProcessor(
        sample_rate=cfg.sample_rate,
        mel_bins=cfg.mel_bins,
        mel_hop_length=cfg.mel_hop_length,
    )
    # Params as jit arguments: closure-captured arrays would be inlined as
    # program constants (host round-trip + in-executable weight copy).
    _audio_jit = jax.jit(audio_encoder_apply, static_argnames=("config",))
    encode_jit = lambda m: _audio_jit(params, cfg, m)

    def encode(video_path: Path) -> Optional[dict]:
        extracted = extract_audio_pcm(video_path, processor.sample_rate)
        if extracted is None:
            print(f"[precompute] No audio track for {video_path.name}, skipping.")
            return None
        waveform, sr = extracted
        mel = processor.waveform_to_mel(waveform, sr)  # (1, ch, time, mel)
        latents = np.asarray(encode_jit(jnp.asarray(mel)).astype(jnp.float32))
        return {
            "latents": latents[0],
            "num_time_steps": np.array([latents.shape[2]], np.int32),
            "frequency_bins": np.array([latents.shape[3]], np.int32),
            "duration": np.array([waveform.shape[1] / float(sr)], np.float32),
        }

    return encode


def compute_edge_reference(frames: np.ndarray) -> np.ndarray:
    """Canny edge maps as IC-LoRA reference frames
    (reference: ltx_trainer/scripts/compute_reference.py intent)."""
    import cv2

    out = []
    for f in frames:
        gray = cv2.cvtColor((f * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
        edges = cv2.Canny(gray, 100, 200).astype(np.float32) / 255.0
        out.append(np.stack([edges] * 3, axis=-1))
    return np.stack(out, axis=0)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Precompute latents for training")
    parser.add_argument("--videos", "--input-dir", required=True, dest="videos",
                        help="Directory of input videos")
    parser.add_argument("--output", "--output-dir", required=True, dest="output",
                        help="Output dataset root")
    parser.add_argument("--model-repo", default="Lightricks/LTX-2")
    parser.add_argument("--text-encoder-repo", default=None)
    parser.add_argument("--resolution-buckets", default=None, help="WxHxF;WxHxF")
    parser.add_argument("--prompts-file", default=None,
                        help="File of '<stem>: <prompt>' lines or a single shared prompt")
    parser.add_argument("--caption", action="store_true",
                        help="Auto-caption clips missing a prompt")
    parser.add_argument("--caption-model", default="Salesforce/blip-image-captioning-base")
    parser.add_argument("--caption-backend", default="transformers",
                        choices=["transformers", "mlx_vlm"],
                        help="mlx_vlm is the reference backend; transformers here")
    parser.add_argument("--audio", "--with-audio", action="store_true", dest="audio",
                        help="Encode each clip's audio track to mel latents "
                             "(ffmpeg PCM -> log-mel -> AudioEncoder)")
    parser.add_argument("--audio-latents-dir", default=None,
                        help="Copy precomputed audio latents from this dir "
                             "instead of encoding")
    parser.add_argument("--reference-edges", action="store_true",
                        help="Write Canny-edge reference latents (IC-LoRA)")
    parser.add_argument("--reference-dir", default=None,
                        help="Reference videos for video_to_video precompute")
    parser.add_argument("--frame-cap", type=int, default=None)
    parser.add_argument("--fps", type=float, default=24.0)
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args(argv)
    if args.debug:
        import os

        os.environ["MLX_VIDEO_DEBUG"] = "1"

    import jax
    import jax.numpy as jnp

    from mlx_video_tpu.config import VideoVAEConfig
    from mlx_video_tpu.io import vae_weights
    from mlx_video_tpu.loading import resolve_vae_file
    from mlx_video_tpu.models.ltx.text_encoder import LTX2TextEncoder
    from mlx_video_tpu.models.ltx.video_vae.encoder import (
        init_video_encoder,
        video_encoder_apply_chunked,
    )
    from mlx_video_tpu.utils.hub import get_model_path

    model_path = get_model_path(args.model_repo)
    enc_cfg = VideoVAEConfig()
    enc_params = init_video_encoder(jax.random.key(0), enc_cfg, dtype=jnp.bfloat16)
    vae_weights.load_video_encoder_weights(resolve_vae_file(model_path), enc_params)
    # Per-block jits with eager layout transposes (PERF.md round 2).
    encode_jit = lambda v: video_encoder_apply_chunked(enc_params, enc_cfg, v)

    te_path = get_model_path(args.text_encoder_repo) if args.text_encoder_repo else model_path
    text_encoder = LTX2TextEncoder.load(model_path, te_path)

    def text_encode(prompt: str):
        video, audio = text_encoder.encode(prompt)
        return {
            "video_prompt_embeds": np.asarray(video[0], np.float32),
            "audio_prompt_embeds": np.asarray(audio[0], np.float32),
            "prompt_attention_mask": np.ones((video.shape[1],), bool),
        }

    videos = sorted(
        p for p in Path(args.videos).iterdir() if p.suffix.lower() in (".mp4", ".mov", ".webm")
    )

    prompts = {}
    if args.prompts_file:
        text = Path(args.prompts_file).read_text()
        stems = {p.stem for p in videos}
        for line in text.splitlines():
            if ":" in line:
                stem, prompt = line.split(":", 1)
                prompts[stem.strip()] = prompt.strip()
        if text.strip() and not (prompts.keys() & stems):
            # advertised "single shared prompt" mode: a file whose lines
            # name no actual clip stem conditions every clip on its content
            # (a colon INSIDE a shared prompt must not shadow this)
            shared = " ".join(text.split())
            prompts = {s: shared for s in stems}
    buckets = parse_buckets(args.resolution_buckets) if args.resolution_buckets else None
    caption_fn = None
    if args.caption:
        from mlx_video_tpu.trainer.aux import caption_video

        caption_fn = lambda p: caption_video(p, model_name=args.caption_model)  # noqa: E731

    audio_encode_fn = None
    if args.audio_latents_dir:
        # Copy mode (reference: precompute.py:359-365): reuse latents computed
        # in an earlier pass instead of re-encoding.
        audio_src = Path(args.audio_latents_dir)

        def audio_encode_fn(video_path: Path):
            for name in (f"latent_{video_path.stem}.safetensors",
                         f"{video_path.stem}.safetensors"):
                src = audio_src / name
                if src.exists():
                    from mlx_video_tpu.io.safetensors import SafetensorsReader

                    with SafetensorsReader(src) as r:
                        return {k: np.asarray(r.get(k)) for k in r.keys()}
            print(f"[precompute] Missing audio latents for {video_path.stem}, skipping.")
            return None
    elif args.audio:
        audio_encode_fn = make_audio_encode_fn(model_path)

    n = precompute_dataset(
        videos,
        Path(args.output),
        encode_fn=lambda t: encode_jit(jnp.asarray(t)),
        text_encode_fn=text_encode,
        prompts=prompts,
        buckets=buckets,
        audio_encode_fn=audio_encode_fn,
        reference_fn=compute_edge_reference if args.reference_edges else None,
        reference_dir=Path(args.reference_dir) if args.reference_dir else None,
        frame_cap=args.frame_cap,
        caption_fn=caption_fn,
        fps=args.fps,
    )
    print(f"Precomputed {n} clips into {args.output}")


if __name__ == "__main__":
    main()
