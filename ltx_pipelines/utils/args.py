"""Reusable argparse fragments for the pipeline CLIs
(reference: ltx_pipelines/utils/args.py:80-277)."""

from __future__ import annotations

import argparse


def add_common_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--prompt", required=True)
    parser.add_argument("--negative-prompt", default=None)
    parser.add_argument("--model-repo", default="Lightricks/LTX-2")
    parser.add_argument("--checkpoint-path", default=None,
                        help="Explicit checkpoint path (overrides --model-repo)")
    parser.add_argument("--gemma-root", default=None,
                        help="Text-encoder snapshot root")
    parser.add_argument("--spatial-upsampler-path", default=None,
                        help="Explicit 2x latent upsampler weights path")
    parser.add_argument("--height", type=int, default=512)
    parser.add_argument("--width", type=int, default=512)
    parser.add_argument("--num-frames", type=int, default=33)
    parser.add_argument("--num-inference-steps", type=int, default=None)
    parser.add_argument("--cfg-guidance-scale", type=float, default=None)
    parser.add_argument("--seed", type=int, default=10)
    parser.add_argument("--frame-rate", "--fps", type=float, default=24.0, dest="fps")
    parser.add_argument("--output-path", default="output.mp4")
    parser.add_argument("--enhance-prompt", action="store_true")
    parser.add_argument("--enable-fp8", action="store_true",
                        help="(parity) no effect on TPU; ignored")


def add_image_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "--image", action="append", nargs="+", default=[],
        metavar="PATH [FRAME_IDX] [STRENGTH]",
    )


def add_video_conditioning_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "--video-conditioning", action="append", nargs="+", default=[],
        metavar="PATH [FRAME_IDX] [STRENGTH]",
    )


def add_lora_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--lora", action="append", nargs="+", default=[],
                        metavar="PATH [STRENGTH]")
    parser.add_argument("--distilled-lora", action="append", nargs="+", default=[],
                        metavar="PATH [STRENGTH]",
                        help="LoRA applied to the stage-2 transformer copy")


def parse_tuple_args(values, defaults=(0, 1.0)):
    out = []
    for item in values:
        path = item[0]
        idx = int(item[1]) if len(item) > 1 else defaults[0]
        strength = float(item[2]) if len(item) > 2 else defaults[1]
        out.append((path, idx, strength))
    return out
