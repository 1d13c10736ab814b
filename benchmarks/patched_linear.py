"""Smoke test for the flax-Dense patch — X3 analog.

The reference ships a smoke script for its monkey-patched `nn.Linear`
(reference benchmarks/pytorch_linear.py: build nn.Linear(768,768), run a
(16,16,768) batch, print the output). Same protocol: construct a plain
flax Dense *inside* the patch context so its matmul runs on the
framework's mm op, apply it to the reference's shapes, and check the
result (and its gradient) against the unpatched layer.

Usage: python benchmarks/patched_linear.py [--cpu]
"""

from __future__ import annotations

from common import base_parser, setup_platform


def main():
    args = base_parser("patched flax.linen.Dense smoke test").parse_args()
    setup_platform(cpu=args.cpu)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpusparse.patch import patch_flax_dense

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 16, 768))

    with patch_flax_dense():
        import flax.linen as nn

        layer = nn.Dense(768)
        assert type(layer).__name__ == "PatchedDense"
        params = layer.init(key, x)
        out = layer.apply(params, x)
        grad = jax.grad(lambda p: jnp.sum(layer.apply(p, x) ** 2))(params)

    # oracle on host in fp64 — the TPU's own jnp matmul defaults to bf16
    # MXU passes and would contribute more error than the kernel under test
    xn = np.asarray(x, np.float64)
    kn = np.asarray(params["params"]["kernel"], np.float64)
    bn = np.asarray(params["params"]["bias"], np.float64)
    ref_out = xn @ kn + bn
    ref_gk = np.einsum("bsi,bso->io", xn, 2 * ref_out)
    ref_gb = (2 * ref_out).sum((0, 1))

    err = float(np.abs(np.asarray(out) - ref_out).max() / np.abs(ref_out).max())
    gk_err = float(
        np.abs(np.asarray(grad["params"]["kernel"]) - ref_gk).max()
        / np.abs(ref_gk).max()
    )
    gb_err = float(
        np.abs(np.asarray(grad["params"]["bias"]) - ref_gb).max()
        / np.abs(ref_gb).max()
    )
    print("output:", np.asarray(out)[0, 0, :4], "rel err vs numpy:", err)
    print("grad rel errs: kernel", gk_err, "bias", gb_err)
    assert err < 1e-4 and gk_err < 1e-4 and gb_err < 1e-4
    print("patched Dense forward+backward parity OK")


if __name__ == "__main__":
    main()
