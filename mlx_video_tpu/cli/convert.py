"""``python -m mlx_video_tpu.cli.convert`` — checkpoint conversion CLI."""

from mlx_video_tpu.convert import main

if __name__ == "__main__":
    main()
