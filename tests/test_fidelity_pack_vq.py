"""Checked-in VQ fidelity pack: schema + compare machinery end-to-end on
NON-repo-generated data (VERDICT r4 item 5).

The pack at ``tests/fixtures/vq_pack_catdog.npz`` was recorded by
``scripts/record_reference_pack.py --vq`` running the ACTUAL reference VQ-16
(``llamagen_tokenizer/tokenizer_image/vq_model.py``) with seeded weights on
the reference's own validation photo. This test rebuilds the same weights
(same seed), converts them with ``utils/convert.convert_vq``, replays the
image through the JAX VQ, and requires exact index agreement + close recon —
proving the npz schema, the converter, and ``compare_vq_to_pack`` against
data the repo did not produce.
"""

import os

import numpy as np
import pytest

REF = "/root/reference"
PACK = os.path.join(os.path.dirname(__file__), "fixtures", "vq_pack_catdog.npz")


def test_pack_loads_and_schema():
    from omnimamba_tpu.eval.fidelity import load_vq_pack

    pack = load_vq_pack(PACK)
    assert pack.indices.shape == (1, 8, 8)
    assert pack.recon.shape == (1, 128, 128, 3)
    assert pack.size == 128
    assert pack.image_path == "mmu_validation/cat_dog.png"
    assert "producer" in pack.meta


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not present")
def test_compare_vq_to_pack_end_to_end():
    torch = pytest.importorskip("torch")

    from omnimamba_tpu.config import VQConfig
    from omnimamba_tpu.eval.fidelity import (
        compare_vq_to_pack,
        load_vq_pack,
        vq_pack_image,
    )
    from omnimamba_tpu.utils.convert import convert_vq

    import sys

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from llamagen_tokenizer.tokenizer_image.vq_model import VQ_16

    torch.manual_seed(0)  # identical weights to the pack's producer
    ref = VQ_16()
    ref.eval()
    cfg = VQConfig()
    params = convert_vq(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}, cfg
    )

    pack = load_vq_pack(PACK)
    image = vq_pack_image(pack, REF)
    report = compare_vq_to_pack(params, cfg, pack, image)
    assert report["indices_match"], report
    assert report["recon_close"], report
