import jax
import jax.numpy as jnp
import numpy as np

from vmap_tpu.geometry.obb import OrientedBox
from vmap_tpu.models import OccupancyField


def test_create_and_forward():
    f = OccupancyField.create(jax.random.PRNGKey(0), hidden=16, scale=2.0)
    occ, color = f(jnp.zeros((5, 3)))
    assert occ.shape == (5,) and color.shape == (5, 3)
    assert np.all((np.asarray(occ) >= 0) & (np.asarray(occ) <= 1))


def test_field_is_pytree():
    f = OccupancyField.create(jax.random.PRNGKey(0), hidden=16)
    g = jax.jit(lambda field, x: field(x)[0].sum())
    val = g(f, jnp.ones((4, 3)))
    assert np.isfinite(float(val))
    grads = jax.grad(lambda field: field(jnp.ones((4, 3)))[0].sum())(f)
    assert np.abs(np.asarray(grads.mlp["w_in"])).sum() > 0


def test_eval_points_and_mesh():
    f = OccupancyField.create(jax.random.PRNGKey(1), hidden=16, scale=2.0)
    # craft a field that is dense near the origin: bias the alpha head
    mlp = dict(f.mlp)
    mlp["b_alpha"] = jnp.ones_like(mlp["b_alpha"]) * 0.0
    f = f.replace(mlp=mlp)
    occ, color = f.eval_points(np.random.randn(300, 3).astype(np.float32),
                               chunk=128)
    assert occ.shape == (300,)
    box = OrientedBox([0, 0, 0], np.eye(3), [1.0, 1.0, 1.0])
    mesh = f.extract_mesh(box, grid_dim=16)
    # an untrained random field usually has some 0.5 level set inside the box
    if mesh is not None:
        assert len(mesh.faces) > 0
        assert mesh.vertex_colors is not None
