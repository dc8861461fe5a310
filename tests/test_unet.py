import jax
import jax.numpy as jnp
import numpy as np

from gssd_tpu.models.unet import UNet, segmentation_nll_loss


def test_unet_shapes_and_learning(rng):
    model = UNet(n_classes=2, feature_scale=8)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    labels = jnp.asarray((rng.uniform(size=(2, 64, 64)) > 0.7).astype(np.int32))
    vs = model.init(jax.random.PRNGKey(0), x, train=False)
    logits = model.apply(vs, x, train=False)
    assert logits.shape == (2, 64, 64, 2)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": vs["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return segmentation_nll_loss(out, labels)

    l0 = float(loss_fn(vs["params"]))
    g = jax.grad(loss_fn)(vs["params"])
    assert all(np.isfinite(np.asarray(t)).all()
               for t in jax.tree_util.tree_leaves(g))
    # one SGD step reduces loss
    p1 = jax.tree_util.tree_map(lambda p, gg: p - 0.5 * gg, vs["params"], g)
    assert float(loss_fn(p1)) < l0


def test_nll_loss_values():
    logits = jnp.asarray([[[[10.0, -10.0], [-10.0, 10.0]]]])
    labels = jnp.asarray([[[0, 1]]])
    assert float(segmentation_nll_loss(logits, labels)) < 1e-4
    labels_bad = jnp.asarray([[[1, 0]]])
    assert float(segmentation_nll_loss(logits, labels_bad)) > 10
