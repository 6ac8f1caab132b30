"""Reusable argparse fragments for the pipeline CLIs
(reference: ltx_pipelines/utils/args.py:80-277)."""

from __future__ import annotations

import argparse


def add_common_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--prompt", required=True)
    parser.add_argument("--negative-prompt", default=None)
    parser.add_argument("--model-repo", default="Lightricks/LTX-2")
    parser.add_argument("--height", type=int, default=512)
    parser.add_argument("--width", type=int, default=512)
    parser.add_argument("--num-frames", type=int, default=33)
    parser.add_argument("--seed", type=int, default=10)
    parser.add_argument("--frame-rate", "--fps", type=float, default=24.0, dest="fps")
    parser.add_argument("--output-path", default="output.mp4")


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


def parse_tuple_args(values, defaults=(0, 1.0)):
    out = []
    for item in values:
        path = item[0]
        idx = int(item[1]) if len(item) > 1 else defaults[0]
        strength = float(item[2]) if len(item) > 2 else defaults[1]
        out.append((path, idx, strength))
    return out
