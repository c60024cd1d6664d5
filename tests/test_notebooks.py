"""Execute the tutorial notebooks end-to-end so they cannot rot.

The reference ships one never-executed tutorial
(`/root/reference/tutorial/01_Getting_Started.ipynb`); here both notebooks
run under nbclient on every slow-tier CI pass (VERDICT r3 next #8). Shapes
inside the notebooks are already tiny; the only harness intervention is a
prepended cell pinning the CPU backend (the jupyter kernel is a fresh
process, and this image's sitecustomize registers the axon TPU plugin that
would otherwise grab the backend — same reason tests/conftest.py pins it
in-process).
"""

import os
from pathlib import Path

import nbformat
import pytest

NB_DIR = Path(__file__).resolve().parent.parent / "tutorial"

_PIN_BACKEND = """\
import os
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/healnet_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
"""


@pytest.mark.parametrize(
    "name", ["01_Getting_Started.ipynb", "02_Scaling_On_TPU.ipynb"]
)
def test_notebook_executes(name, tmp_path, monkeypatch):
    from nbclient import NotebookClient

    nb = nbformat.read(NB_DIR / name, as_version=4)
    pin = nbformat.v4.new_code_cell(_PIN_BACKEND)
    pin["id"] = "harness-pin-backend"
    nb.cells.insert(0, pin)

    # the kernel is spawned with the test process's environment; the package
    # is not pip-installed in this image, so put the repo root on PYTHONPATH
    monkeypatch.setenv(
        "PYTHONPATH",
        str(NB_DIR.parent) + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    client = NotebookClient(
        nb,
        timeout=900,
        kernel_name="python3",
        resources={"metadata": {"path": str(tmp_path)}},
    )
    client.execute()

    # every code cell ran without error output
    for cell in nb.cells:
        if cell.cell_type != "code":
            continue
        for out in cell.get("outputs", []):
            assert out.get("output_type") != "error", (
                f"{name} cell failed:\n{cell.source[:300]}\n"
                f"{out.get('ename')}: {out.get('evalue')}"
            )
