"""``python -m mlx_video_tpu.cli.precompute`` — latent precompute CLI."""

from mlx_video_tpu.trainer.precompute import main

if __name__ == "__main__":
    main()
