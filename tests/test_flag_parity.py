"""Every Config field named in docs/FLAGS.md must actually exist."""

import os
import re

from pstl_tpu.config import Config

DOC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "FLAGS.md")


def test_mapped_fields_exist():
    cfg = Config()
    text = open(DOC).read()
    missing = []
    for line in text.splitlines():
        if not line.startswith("| --"):
            continue
        cells = [c.strip() for c in line.split("|")]
        here = cells[2]
        if "n/a" in here or "absorbed" in here or "CLI" in here:
            continue
        for field in re.split(r"\s*/\s*", here):
            field = field.split()[0].strip("`")
            if field.startswith("*"):
                continue
            if not hasattr(cfg, field):
                missing.append(field)
    assert not missing, f"FLAGS.md names unknown Config fields: {missing}"


def test_extras_exist():
    cfg = Config()
    for field in ("sampler", "ddim_steps", "ddim_eta",
                  "guidance_positive_offset_quirk", "use_pallas_clearance",
                  "mesh_shape", "compute_dtype"):
        assert hasattr(cfg, field), field
