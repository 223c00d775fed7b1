from cofusion_tpu.cli import run

raise SystemExit(run())
