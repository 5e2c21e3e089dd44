"""Compatibility launcher: same entry-point name as the reference
(code/main_train_masked.py). Delegates to the package CLI, which preserves the
flag surface. `accelerate launch` wrappers are unnecessary — multi-chip
parallelism comes from the device mesh (and --multihost on pods)."""

import sys

from masked_diffusion_tpu.cli.main_train_masked import main

if __name__ == "__main__":
    sys.exit(main())
