"""AOT export: serialized StableHLO artifact reproduces the live detector."""

import jax
import jax.numpy as jnp
import numpy as np


def test_exported_detector_roundtrip(tiny_conf, tmp_path):
    from m3dssd_tpu.anchors import locate_anchors
    from m3dssd_tpu.inference.detect import make_detector
    from m3dssd_tpu.inference.export import (export_detector, load_detector,
                                             save_exported)
    from m3dssd_tpu.models import build
    from m3dssd_tpu.train.state import create_train_state
    from m3dssd_tpu.utils.synthetic_conf import finalize_conf_synthetic

    conf = finalize_conf_synthetic(tiny_conf.replace(anchors=None))
    model = build(conf, "test")
    state = create_train_state(conf, model, jax.random.PRNGKey(0), max_iter=1)
    rois = locate_anchors(conf.anchors, conf.feat_size, conf.feat_stride)

    exp = export_detector(conf, rois, model, state.params, state.batch_stats,
                          platforms=("cpu",))
    path = str(tmp_path / "det.shlo")
    save_exported(exp, path, conf=conf)

    served = load_detector(path)
    assert served.meta["det_cols"][4] == "score"
    assert served.meta["test_scale"] == list(conf.test_scale)

    h, w = conf.test_scale
    img = jnp.asarray(
        np.random.RandomState(0).rand(1, h, w, 3).astype(np.float32))
    sf = jnp.float32(1.0)
    live = make_detector(conf, rois, model)(
        state.params, state.batch_stats, img, sf)
    aot = served(img, sf)
    np.testing.assert_allclose(np.asarray(aot), np.asarray(live),
                               rtol=1e-5, atol=1e-5)

    # batched export: signature only (lowering is the expensive part we
    # already exercised above; the batched detector itself is e2e-tested)
    exp_b = export_detector(conf, rois, model, state.params,
                            state.batch_stats, batch_size=2,
                            platforms=("cpu",))
    assert exp_b.in_avals[0].shape == (2, h, w, 3)
    assert exp_b.in_avals[1].shape == (2,)
    assert exp_b.out_avals[0].shape == (2, conf.nms_topN_post, 14)
