"""Docs stay in sync with the code they describe."""

import dataclasses
import os

from vitparticlefiltertracker_tpu import config as cfgmod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_config_doc_covers_every_field():
    doc = open(os.path.join(REPO, "docs", "CONFIG.md")).read()
    for cls in (
        cfgmod.ModelConfig,
        cfgmod.MotionConfig,
        cfgmod.FilterConfig,
        cfgmod.TrackerConfig,
        cfgmod.IOConfig,
        cfgmod.RuntimeConfig,
    ):
        for f in dataclasses.fields(cls):
            assert f.name in doc, (
                f"docs/CONFIG.md is missing {cls.__name__}.{f.name}"
            )


def test_readme_mentions_every_cli_command():
    readme = open(os.path.join(REPO, "README.md")).read()
    from vitparticlefiltertracker_tpu.cli import build_parser

    for action in build_parser()._actions:
        if action.dest == "command":
            for cmd in action.choices:
                assert cmd in readme, f"README.md missing CLI command {cmd!r}"
