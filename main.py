"""Reference-familiar entry point: ``python main.py --trainer ... --config ...``.

Thin shim over ``prior_diffuse_tpu.cli`` (the reference's `main.py`
CLI surface; see that module for the flags).
"""

from prior_diffuse_tpu.cli import main

if __name__ == "__main__":
    main()
