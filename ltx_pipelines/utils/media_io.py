"""Media IO passthrough (reference: ltx_pipelines/utils/media_io.py uses PyAV;
here cv2/ffmpeg via the engine's io.media)."""

from mlx_video_tpu.io.media import (  # noqa: F401
    VideoWriter,
    frames_to_uint8,
    load_image,
    load_video,
    mux_audio,
    prepare_image_for_encoding,
    prepare_video_for_encoding,
    write_video,
)


def encode_video(frames, path, fps: float = 24.0) -> str:
    """(B,3,F,H,W) [-1,1] or (F,H,W,3) uint8 -> mp4 (reference parity name)."""
    import numpy as np

    frames = np.asarray(frames)
    if frames.ndim == 5:
        write_video(path, frames, fps)
    else:
        with VideoWriter(path, frames.shape[2], frames.shape[1], fps) as w:
            w.write(frames)
    return str(path)
