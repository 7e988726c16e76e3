"""Config system package (default.yaml lives here; CLI in cfg/cli.py)."""
