"""CLI-surface smoke tests (reference train.py:30-43 semantics).

Drives ``train.main`` in-process on the tiny synthetic config. Guards the
argument handling that unit tests on workers can't see — in particular the
reference's ``--debug`` contract: batch size forced to 2, train split forced
to 'val', one data worker, single epoch (reference train.py:36-43).
"""

import glob
import json
import os
import tempfile

import pytest
import yaml


@pytest.fixture(scope="module")
def tiny_yaml(tmp_path_factory):
    # rebuild the conftest tiny_config as a YAML file for the CLI
    from tests.conftest import tiny_config as fixture_fn  # noqa: F401
    from vq_vae_gan_diffusion_tpu.config import load_config

    # materialize via the fixture function's wrapped body
    import tests.conftest as c
    cfg = c.tiny_config.__wrapped__()
    d = cfg.to_dict()
    d["trainer"]["log_dir"] = str(tmp_path_factory.mktemp("cli_logs"))
    d["architecture"]["model_name"] = "vqvae"
    path = str(tmp_path_factory.mktemp("cli_cfg") / "tiny.yml")
    with open(path, "w") as f:
        yaml.safe_dump(d, f)
    load_config(path)  # must round-trip
    return path


def test_train_cli_debug_contract(tiny_yaml):
    # load by explicit path: a bare `import train` is vulnerable to sys.path
    # pollution (the torch-parity tests put /root/reference on the path,
    # which also has a train.py)
    import importlib.util
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "repo_train_cli", os.path.join(root, "train.py"))
    train_cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(train_cli)

    rc = train_cli.main(["--config", tiny_yaml, "--debug", "--seed", "1",
                         "--platform", "cpu"])
    assert rc == 0

    with open(tiny_yaml) as f:
        log_dir = yaml.safe_load(f)["trainer"]["log_dir"]
    runs = sorted(glob.glob(os.path.join(log_dir, "*", "vqvae", "run_*")))
    assert runs, "run dir not created"
    run = runs[-1]
    info = open(os.path.join(run, "info.log")).read()
    # reference --debug: batch 2 (train.py:37), rounded up to the mesh's
    # data-parallel axis (8 on the virtual test mesh)
    from vq_vae_gan_diffusion_tpu.parallel import create_mesh
    dbs = max(2, int(create_mesh().shape.get("data", 1)))
    assert f"(batch {dbs}," in info
    assert os.path.exists(os.path.join(run, "config_snapshot.yml")) or \
        glob.glob(os.path.join(run, "*.yml"))
    metrics = os.path.join(run, "metrics.jsonl")
    assert os.path.exists(metrics)
    lines = [json.loads(l) for l in open(metrics) if l.strip()]
    assert lines, "no metrics logged"

    # generation CLI against the checkpoint the training run just wrote
    # (reference generate.py:31-208 flow: build model, load, sample grids)
    import importlib.util
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "repo_generate_cli", os.path.join(root, "generate.py"))
    gen_cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen_cli)
    ckpt = os.path.join(run, "ckpt")
    assert os.path.isdir(ckpt), "training run left no checkpoint"
    rc = gen_cli.main(["--config", tiny_yaml, "--ckpt", ckpt,
                       "--n-samples", "4", "--platform", "cpu"])
    assert rc == 0
    gruns = sorted(glob.glob(os.path.join(log_dir, "*", "vqvae_generate",
                                          "run_*")))
    assert gruns, "generate run dir not created"
    arts = [f for f in os.listdir(gruns[-1])
            if f.endswith((".jpg", ".png", ".gif"))]
    assert arts, "no image artifacts generated"


def _load_cli(name):
    import importlib.util
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        f"repo_{name}_cli", os.path.join(root, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_train_diffusion_cli_debug(tmp_path):
    """Standalone pixel-diffusion CLI (reference train_diffusion.py)."""
    mod = _load_cli("train_diffusion")
    rc = mod.main(["--debug", "--epochs", "1", "--timesteps", "8",
                   "--sampling-timesteps", "4", "--dim", "16",
                   "--img-size", "16", "--data-root",
                   str(tmp_path / "nodata"), "--log-dir", str(tmp_path),
                   "--platform", "cpu"])
    assert rc == 0


def test_vq_diffusion_cli_smoke(tmp_path):
    """Educational VQ-diffusion CLI (reference root vq_diffusion.py, which
    had `__main__: pass` — here it actually runs)."""
    mod = _load_cli("vq_diffusion")
    rc = mod.main(["--steps", "2", "--diffusion-steps", "4",
                   "--platform", "cpu"])
    assert rc == 0


def test_fused_posterior_config_plumbing():
    """--fused-posterior → architecture.vqdiffusion.fused_posterior →
    DiscreteDiffusion.fused_posterior (composite wiring)."""
    import tests.conftest as c
    from vq_vae_gan_diffusion_tpu.models.vq_diffusion_composite import (
        VQDiffusionComposite)
    cfg = c.tiny_config.__wrapped__()
    cfg = cfg.replace_path("architecture.model_name", "vqdiffusion")
    cfg = cfg.replace_path("architecture.vqdiffusion.diffusion_type",
                           "VQ_Official")
    cfg = cfg.replace_path("architecture.vqdiffusion.fused_posterior", True)
    comp = VQDiffusionComposite(cfg)
    assert comp.prior.fused_posterior is True
