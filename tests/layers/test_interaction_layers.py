"""Tests for CIN, DCN-mix, SENET, SparseGNN, MMoE, PLE layers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_now_tpu.layers import (CINLayer, DCNMixLayer, SENETLayer,
                                SparseGNNLayer, MMOELayer, PLELayer)

KEY = jax.random.PRNGKey(0)


def naive_cin(emb, weights, output_input=True, sum_channel=True):
    """Naive CIN per reference semantics (cin_layer.py:96-121).

    emb: (B, F, D); weights: list of (H_k, F, H_{k-1})."""
    b, f, d = emb.shape
    x0 = np.transpose(emb, (0, 2, 1))            # (B, D, F)
    layers = [x0]
    for w in weights:
        prev = layers[-1]                        # (B, D, H)
        outer = np.einsum("bdf,bdh->bdfh", x0, prev)
        k = w.shape[0]
        flat = outer.reshape(b, d, -1)           # (B, D, F*H)
        wflat = w.reshape(k, -1)                 # (K, F*H)
        layers.append(np.einsum("bdm,km->bdk", flat, wflat))
    if not output_input:
        layers = layers[1:]
    out = np.concatenate(layers, axis=-1)        # (B, D, sum)
    if sum_channel:
        return out.sum(-1)                       # (B, D)
    out = np.transpose(out, (0, 2, 1))
    return out.reshape(b, -1)


class TestCIN:
    @pytest.mark.parametrize("output_input,sum_channel", [
        (True, True), (False, True), (True, False), (False, False)])
    def test_matches_naive(self, output_input, sum_channel):
        b, f, d = 3, 4, 5
        hidden = [6, 3]
        emb = jax.random.normal(KEY, (b, f, d))
        layer = CINLayer(hidden_sizes=hidden)
        params = layer.init(KEY, emb)
        out = layer.apply(params, emb, output_input=output_input,
                          sum_channel=sum_channel)
        ws = [np.asarray(params["params"][f"weight_of_layer{i+1}"])
              for i in range(len(hidden))]
        expected = naive_cin(np.asarray(emb), ws, output_input, sum_channel)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-3,
                                   atol=1e-4)

    def test_list_and_flat_inputs_agree(self):
        b, f, d = 2, 3, 4
        emb = jax.random.normal(KEY, (b, f, d))
        layer3d = CINLayer(hidden_sizes=[4])
        params = layer3d.init(KEY, emb)
        out_3d = layer3d.apply(params, emb)
        out_list = layer3d.apply(params, [emb[:, i] for i in range(f)])
        layer_flat = CINLayer(hidden_sizes=[4], embedding_dim=d)
        out_flat = layer_flat.apply(params, emb.reshape(b, f * d))
        np.testing.assert_allclose(np.asarray(out_3d), np.asarray(out_list),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out_3d), np.asarray(out_flat),
                                   rtol=1e-5)

    def test_flat_without_dim_raises(self):
        layer = CINLayer(hidden_sizes=[4])
        with pytest.raises(ValueError):
            layer.init(KEY, jnp.ones((2, 12)))


class TestDCNMix:
    @pytest.mark.slow
    def test_shapes_and_naive(self):
        b, d, s, n, L = 3, 6, 2, 2, 2
        x = jax.random.normal(KEY, (b, d))
        layer = DCNMixLayer(dim_sub_space=s, num_layer=L, num_expert=n)
        params = layer.init(KEY, x)
        out = layer.apply(params, x)
        assert out.shape == (b, d)

        p = params["params"]
        xi = np.asarray(x)
        cur = xi
        for li in range(L):
            o2s = np.asarray(p["origin_to_sub_kernels"])[li]
            s2s = np.asarray(p["sub_to_sub_kernels"])[li]
            s2o = np.asarray(p["sub_to_origin_kernels"])[li]
            bias = np.asarray(p["biases"])[li]
            gk = np.asarray(p["gate_kernels"])[li]
            sub = np.tanh(np.einsum("bd,nds->bns", cur, o2s))
            sub = np.tanh(np.einsum("bns,nst->bnt", sub, s2s))
            origin = np.einsum("bns,nsd->bnd", sub, s2o) + bias
            origin = xi[:, None, :] * origin
            gates = cur @ gk
            gates = np.exp(gates - gates.max(-1, keepdims=True))
            gates = gates / gates.sum(-1, keepdims=True)
            cur = np.einsum("bnd,bn->bd", origin, gates)
        np.testing.assert_allclose(np.asarray(out), cur, rtol=1e-3,
                                   atol=1e-4)


class TestSENET:
    def test_unequal_dims_and_naive(self):
        b = 4
        dims = [3, 5, 2]
        rng = np.random.RandomState(0)
        inputs = [jnp.array(rng.randn(b, dd).astype(np.float32))
                  for dd in dims]
        layer = SENETLayer(reduction_ratio=0.5)
        params = layer.init(KEY, inputs)
        out = layer.apply(params, inputs)
        assert out.shape == (b, sum(dims))

        p = params["params"]
        squeezed = np.concatenate(
            [np.asarray(x).mean(-1, keepdims=True) for x in inputs], -1)
        h = np.tanh(squeezed @ np.asarray(p["senet/dense_0"]["kernel"])
                    + np.asarray(p["senet/dense_0"]["bias"]))
        w = np.tanh(h @ np.asarray(p["senet/dense_1"]["kernel"])
                    + np.asarray(p["senet/dense_1"]["bias"]))  # (B, F)
        pos = np.concatenate([[i] * dd for i, dd in enumerate(dims)])
        expected = np.concatenate([np.asarray(x) for x in inputs], -1) \
            * w[:, pos]
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-3,
                                   atol=1e-5)

    def test_middle_dim_at_least_one(self):
        inputs = [jnp.ones((2, 3))]
        layer = SENETLayer(reduction_ratio=0.1)  # round(1*0.1) -> 1 (min)
        params = layer.init(KEY, inputs)
        assert params["params"]["senet/dense_0"]["kernel"].shape == (1, 1)


class TestSparseGNN:
    def _build(self, **kwargs):
        fields = ["user_id", "user_age", "doc_id", "doc_subject"]
        field2neighbors = {
            "user_id": ["doc_id", "doc_subject"],
            "user_age": ["doc_subject"],
            "doc_subject": ["user_age"],
        }
        return SparseGNNLayer(fields=fields,
                              field2neighbors=field2neighbors, **kwargs)

    def test_shapes(self):
        b, f, d = 2, 4, 3
        emb = jax.random.normal(KEY, (b, f, d))
        layer = self._build(num_layers=3,
                            share_weights_between_layers=False)
        params = layer.init(KEY, emb)
        out = layer.apply(params, emb)
        assert out.shape == (b, f * d)
        assert len(params["params"]) == 3  # one weight set per layer

    def test_shared_weights(self):
        emb = jax.random.normal(KEY, (2, 4, 3))
        layer = self._build(num_layers=3, share_weights_between_layers=True)
        params = layer.init(KEY, emb)
        assert len(params["params"]) == 1

    def test_naive_one_layer(self):
        b, f, d = 2, 4, 3
        emb = jax.random.normal(KEY, (b, f, d))
        layer = self._build(num_layers=1)
        params = layer.init(KEY, emb)
        out = layer.apply(params, emb, flattern_outputs=False)
        w = np.asarray(params["params"]["weights_0"])
        fields = ["user_id", "user_age", "doc_id", "doc_subject"]
        f2i = {x: i for i, x in enumerate(fields)}
        f2n = {"user_id": ["doc_id", "doc_subject"],
               "user_age": ["doc_subject"],
               "doc_subject": ["user_age"]}
        indices = sorted([[f2i[n], f2i[fld]]
                          for fld in fields for n in f2n.get(fld, [])])
        dense = np.zeros((f, f), np.float32)
        for (r, c), val in zip(indices, w):
            dense[r, c] = val
        x = np.transpose(np.asarray(emb), (0, 2, 1))  # (B, D, F)
        expected = np.tanh(x + x @ dense)             # (B, D, F)
        expected = np.transpose(expected, (0, 2, 1))
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4,
                                   atol=1e-5)

    def test_validation(self):
        with pytest.raises(ValueError):
            SparseGNNLayer(fields=["a", "a"], field2neighbors={}).init(
                KEY, jnp.ones((2, 2, 3)))
        with pytest.raises(ValueError):
            SparseGNNLayer(fields=["a"], field2neighbors={"b": ["a"]}).init(
                KEY, jnp.ones((2, 1, 3)))

    def test_edge_list_form(self):
        layer = SparseGNNLayer(
            fields=["a", "b"], field2neighbors=[("a", "b")])
        emb = jax.random.normal(KEY, (2, 2, 3))
        out = layer.apply(layer.init(KEY, emb), emb)
        assert out.shape == (2, 6)


class TestMMoE:
    def test_shapes_and_merge(self):
        b, d, n, t = 4, 6, 3, 2
        x = jax.random.normal(KEY, (b, d))
        layer = MMOELayer(num_task=t, num_experts=n, dnn_dims=[8, 5])
        params = layer.init(KEY, x)
        out = layer.apply(params, x)
        assert out.shape == (t, b, 5)
        outs = layer.apply(params, x, merge_output=False)
        assert len(outs) == t
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(outs[0]),
                                   rtol=1e-6)

    def test_gate_convex_combination(self):
        # with a single expert, gates are all 1 -> output == expert output
        b, d = 3, 4
        x = jax.random.normal(KEY, (b, d))
        layer = MMOELayer(num_task=2, num_experts=1, dnn_dims=[4])
        params = layer.init(KEY, x)
        out = layer.apply(params, x)
        kernel = np.asarray(
            params["params"]["experts/MultiDenseLayer_0"]["kernel"])
        bias = np.asarray(
            params["params"]["experts/MultiDenseLayer_0"]["bias"])
        expected = np.asarray(x) @ kernel[0] + bias[0]
        for t in range(2):
            np.testing.assert_allclose(np.asarray(out[t]), expected,
                                       rtol=1e-4, atol=1e-5)


class TestPLE:
    @pytest.mark.slow
    def test_shapes(self):
        b, d = 4, 6
        x = jax.random.normal(KEY, (b, d))
        layer = PLELayer(num_task=2, list_of_dnn_dims=[[8], [4]],
                         list_of_num_experts_per_task=2)
        params = layer.init(KEY, x)
        outs = layer.apply(params, x)
        assert len(outs) == 2
        for o in outs:
            assert o.shape == (b, 4)

    def test_param_normalization(self):
        layer = PLELayer(num_task=2, list_of_dnn_dims=[4, [3, 2]],
                         list_of_num_experts_per_task=[1, [2, 1, 1]])
        dnn_dims, experts, is_shared, names = layer._normalized()
        assert dnn_dims == [[4], [3, 2]]
        assert experts == [[1, 1, 1], [2, 1, 1]]
        assert is_shared == [True, False, False]

    def test_type_errors(self):
        with pytest.raises(TypeError):
            PLELayer(num_task=1, list_of_dnn_dims=3,
                     list_of_num_experts_per_task=1)._normalized()
