"""Launch farm: every script under scripts/train/** must pass flags the CLI
parser actually accepts with valid choice values (the reference farm had
drifted scripts whose flags argparse would reject, SURVEY.md §0 — this guards
against that class of rot)."""

import glob
import os
import re

import pytest

from masked_diffusion_tpu.cli.main_train_masked import build_parser

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = sorted(glob.glob(os.path.join(REPO, "scripts", "train", "**", "*.sh"), recursive=True))

_FLAG_RE = re.compile(r"--([a-z_0-9]+)\s+\"?([^\"\\\s]*)")


def _parse_script(path):
    flags = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            m = _FLAG_RE.match(line)
            if m:
                val = m.group(2)
                # strip ${VAR:-default} down to the default
                env = re.match(r"\$\{[A-Z_]+:-(.*)\}", val)
                if env:
                    val = env.group(1)
                flags[m.group(1)] = val
    return flags


def test_scripts_exist():
    assert len(SCRIPTS) >= 7


@pytest.mark.parametrize("path", SCRIPTS, ids=[os.path.relpath(p, REPO) for p in SCRIPTS])
def test_script_flags_parse(path):
    flags = _parse_script(path)
    assert flags, f"no flags parsed from {path}"
    argv = []
    for k, v in flags.items():
        argv.extend([f"--{k}", v if v else ""])
    args = build_parser().parse_args(argv)  # raises SystemExit on bad flag/choice
    assert args.method in ("base", "mean_shift", "test")
    # schedule/selection coupling must be valid (SURVEY.md §0 drift class)
    if args.method in ("base", "mean_shift"):
        from masked_diffusion_tpu.ops.schedule import build_schedule

        build_schedule(
            args.ddpm_schedule, min(args.ddpm_num_steps, args.data_size**2),
            args.data_size, args.select_degrade_pixel,
        )
