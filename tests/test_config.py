import pytest

from vitparticlefiltertracker_tpu.config import Config, apply_override, load_config


def test_default_config_resolves():
    cfg = Config().resolve()
    assert cfg.model.dim == 768 and cfg.model.depth == 12  # vit-b16 preset
    assert cfg.filter.num_particles == 1024


def test_preset_vit_l16():
    cfg = Config.from_dict({"model": {"variant": "vit-l16"}})
    assert cfg.model.dim == 1024 and cfg.model.depth == 24 and cfg.model.heads == 16


def test_yaml_roundtrip(tmp_path):
    cfg = Config().resolve()
    cfg.filter.num_particles = 256
    p = tmp_path / "config.yaml"
    p.write_text(cfg.to_yaml())
    cfg2 = load_config(str(p))
    assert cfg2.filter.num_particles == 256
    assert cfg2.to_dict() == cfg.to_dict()


def test_cli_override(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(Config().resolve().to_yaml())
    cfg = load_config(str(p), overrides=["filter.num_particles=4096", "model.variant=vit-l16"])
    assert cfg.filter.num_particles == 4096
    assert cfg.model.dim == 1024


def test_unknown_key_rejected():
    with pytest.raises(ValueError, match="unknown config keys"):
        Config.from_dict({"modle": {}})


def test_unknown_override_rejected():
    with pytest.raises(ValueError, match="unknown config path"):
        apply_override(Config(), "filter.nope=3")


def test_invalid_variant_rejected():
    with pytest.raises(ValueError, match="unknown model.variant"):
        Config.from_dict({"model": {"variant": "vit-z99"}})


def test_bare_invocation_picks_up_cwd_config_yaml(tmp_path, monkeypatch):
    """README.md:37,42 contract: a bare `python main.py` is configured by
    ./config.yaml. Implicit pickup applies only to real command-line runs
    (argv=None -> implicit_config=True); explicit-argv callers (tests,
    embedding code) keep built-in defaults."""
    from vitparticlefiltertracker_tpu.cli import build_parser, load

    (tmp_path / "config.yaml").write_text(
        "filter: {num_particles: 77}\n"
    )
    monkeypatch.chdir(tmp_path)
    args = build_parser().parse_args([])
    assert load(args, implicit_config=True).filter.num_particles == 77
    assert load(args).filter.num_particles != 77  # explicit argv: defaults
    # --config always wins over the implicit file.
    (tmp_path / "other.yaml").write_text("filter: {num_particles: 33}\n")
    args2 = build_parser().parse_args(["track", "--config", "other.yaml"])
    assert load(args2, implicit_config=True).filter.num_particles == 33
