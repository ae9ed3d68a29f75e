"""`python -m videotuna_tpu <command>` → the per-model command registry."""

from videotuna_tpu.cli.commands import main

if __name__ == "__main__":
    raise SystemExit(main())
