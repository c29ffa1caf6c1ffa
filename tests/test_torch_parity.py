"""Numeric parity vs the torch reference (module by module).

Each test instantiates the reference torch module with random weights,
maps its state_dict onto our flax module, runs both on identical inputs,
and asserts the outputs match. This is the evidence that the rebuilt
modules compute the same function as the reference — without a 160-epoch
training run (reference files cited per test).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

try:
    from tests.ref_oracle import load_reference

    load_reference()
    _REF_OK = True
    _REF_ERR = ""
except Exception as e:  # pragma: no cover
    _REF_OK = False
    _REF_ERR = repr(e)

pytestmark = pytest.mark.skipif(
    not _REF_OK, reason=f"reference oracle unavailable: {_REF_ERR}"
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def t2n(x):
    return x.detach().cpu().numpy()


def lin(sd, prefix):
    """torch Linear params at `prefix` -> flax Dense dict."""
    out = {"kernel": t2n(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = t2n(sd[prefix + ".bias"])
    return out


def norm(sd, prefix):
    """torch LayerNorm/GroupNorm params -> flax scale/bias dict."""
    return {
        "scale": t2n(sd[prefix + ".weight"]),
        "bias": t2n(sd[prefix + ".bias"]),
    }


# --------------------------------------------------------------------------
# KPConv (reference geotransformer/modules/kpconv/kpconv.py:10-133)
# --------------------------------------------------------------------------


class TestKPConv:
    def test_forward_parity(self, rng):
        from geotransformer.modules.kpconv import KPConv as TorchKPConv

        from rdmnet_tpu.nn.kpconv import KPConv
        from rdmnet_tpu.nn.kernel_points import make_kernel_points

        cin, cout, k, radius, sigma = 8, 16, 15, 1.275, 0.6
        n, m, h = 60, 40, 12
        tm = TorchKPConv(cin, cout, k, radius, sigma, bias=True)
        torch.nn.init.normal_(tm.weights, std=0.2)
        torch.nn.init.normal_(tm.bias, std=0.1)
        # pin the kernel disposition: the reference randomly rotates/jitters
        # at init (kernel_points.py:427-455); use our canonical constant in
        # both so geometry terms are identical
        kp = np.asarray(make_kernel_points(radius, k))
        with torch.no_grad():
            tm.kernel_points.copy_(torch.from_numpy(kp))

        s_feats = rng.randn(n, cin).astype(np.float32)
        s_points = (rng.rand(n, 3) * 2.0).astype(np.float32)
        q_points = (rng.rand(m, 3) * 2.0).astype(np.float32)
        # sentinel-padded neighbor table (sentinel = n, the missing marker)
        nbr = rng.randint(0, n, size=(m, h)).astype(np.int64)
        nbr[rng.rand(m, h) < 0.3] = n

        t_out = t2n(
            tm(
                torch.from_numpy(s_feats),
                torch.from_numpy(q_points),
                torch.from_numpy(s_points),
                torch.from_numpy(nbr),
            )
        )

        ours = KPConv(cin, cout, k, radius, sigma, use_bias=True)
        params = {
            "params": {"weights": t2n(tm.weights), "bias": t2n(tm.bias),
                       "kernel_points": kp}
        }
        j_out = np.asarray(
            ours.apply(params, jnp.asarray(s_feats), jnp.asarray(q_points),
                       jnp.asarray(s_points), jnp.asarray(nbr))
        )
        np.testing.assert_allclose(j_out, t_out, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# GroupNorm / UnaryBlock (reference kpconv/modules.py:33-101)
# --------------------------------------------------------------------------


class TestUnaryBlock:
    @pytest.mark.parametrize("layer_norm", [False, True])
    def test_forward_parity(self, rng, layer_norm):
        from geotransformer.modules.kpconv import UnaryBlock as TorchUnary

        from rdmnet_tpu.nn.kpconv import UnaryBlock

        cin, cout, g, n = 24, 32, 8, 50
        tm = TorchUnary(cin, cout, g, has_relu=True, layer_norm=layer_norm)
        x = rng.randn(n, cin).astype(np.float32)
        t_out = t2n(tm(torch.from_numpy(x)))

        sd = tm.state_dict()
        params = {"params": {
            "mlp": lin(sd, "mlp"),
            "norm": norm(sd, "norm" if layer_norm else "norm.norm"),
        }}
        ours = UnaryBlock(cin, cout, g, has_relu=True, layer_norm=layer_norm)
        j_out = np.asarray(
            ours.apply(params, jnp.asarray(x), jnp.ones(n, bool))
        )
        np.testing.assert_allclose(j_out, t_out, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# ThDRoFormer (reference rdmnet/thdroformer/thdroformer.py:266-347)
# --------------------------------------------------------------------------


def thdro_params_from_torch(sd, num_layers):
    """Standalone ThDRoFormer state_dict -> our flax param tree."""
    p = {
        "embedding": lin(sd, "embedding.proj"),
        "in_proj": lin(sd, "in_proj"),
        "out_proj": lin(sd, "out_proj"),
    }
    for i in range(num_layers):
        s = f"transformer.layers.{2 * i}"      # rotary self block
        c = f"transformer.layers.{2 * i + 1}"  # vanilla cross block
        p[f"self_{i}"] = {
            "attention": {
                "proj_q": lin(sd, f"{s}.attention.attention.proj_q"),
                "proj_k": lin(sd, f"{s}.attention.attention.proj_k"),
                "proj_v": lin(sd, f"{s}.attention.attention.proj_v"),
            },
            "linear": lin(sd, f"{s}.attention.linear"),
            "norm": norm(sd, f"{s}.attention.norm"),
            "output": {
                "expand": lin(sd, f"{s}.output.expand"),
                "squeeze": lin(sd, f"{s}.output.squeeze"),
                "norm": norm(sd, f"{s}.output.norm"),
            },
        }
        p[f"cross_{i}"] = {
            "attention": {
                "proj_q": lin(sd, f"{c}.attention.attention.proj_q"),
                "proj_k": lin(sd, f"{c}.attention.attention.proj_k"),
                "proj_v": lin(sd, f"{c}.attention.attention.proj_v"),
            },
            "linear": lin(sd, f"{c}.attention.linear"),
            "norm": norm(sd, f"{c}.attention.norm"),
            "output": {
                "expand": lin(sd, f"{c}.output.expand"),
                "squeeze": lin(sd, f"{c}.output.squeeze"),
                "norm": norm(sd, f"{c}.output.norm"),
            },
        }
    return {"params": p}


class TestThDRoFormer:
    def test_forward_parity(self, rng):
        from rdmnet.thdroformer.thdroformer import ThDRoFormer as TorchThDRo

        from rdmnet_tpu.nn.thdroformer import ThDRoFormer

        din, dout, hidden, heads, layers = 48, 32, 32, 4, 2
        n, m = 30, 26
        tm = TorchThDRo(din, dout, hidden, heads, layers).eval()

        ref_pts = (rng.rand(n, 3) * 10).astype(np.float32)
        src_pts = (rng.rand(m, 3) * 10).astype(np.float32)
        ref_f = rng.randn(n, din).astype(np.float32)
        src_f = rng.randn(m, din).astype(np.float32)

        with torch.no_grad():
            t_ref, t_src = tm(
                torch.from_numpy(ref_pts[None]), torch.from_numpy(src_pts[None]),
                torch.from_numpy(ref_f[None]), torch.from_numpy(src_f[None]),
            )

        ours = ThDRoFormer(din, dout, hidden, heads, layers)
        params = thdro_params_from_torch(tm.state_dict(), layers)
        j_ref, j_src = ours.apply(
            params, jnp.asarray(ref_pts), jnp.asarray(src_pts),
            jnp.asarray(ref_f), jnp.asarray(src_f),
        )
        np.testing.assert_allclose(np.asarray(j_ref), t2n(t_ref)[0], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(j_src), t2n(t_src)[0], rtol=1e-4, atol=1e-4)

    def test_topk_attention_parity(self, rng):
        """dynamic top-k sparse attention (thdroformer.py:20-40)."""
        from rdmnet.thdroformer.thdroformer import ThDRoFormer as TorchThDRo

        from rdmnet_tpu.nn.thdroformer import ThDRoFormer

        din, dout, hidden, heads, layers = 32, 32, 32, 4, 2
        n, m = 24, 24
        kfrac = (0.5, 0.75)
        tm = TorchThDRo(din, dout, hidden, heads, layers, k=list(kfrac)).eval()

        ref_pts = (rng.rand(n, 3) * 10).astype(np.float32)
        src_pts = (rng.rand(m, 3) * 10).astype(np.float32)
        ref_f = rng.randn(n, din).astype(np.float32)
        src_f = rng.randn(m, din).astype(np.float32)

        with torch.no_grad():
            t_ref, t_src = tm(
                torch.from_numpy(ref_pts[None]), torch.from_numpy(src_pts[None]),
                torch.from_numpy(ref_f[None]), torch.from_numpy(src_f[None]),
            )

        ours = ThDRoFormer(din, dout, hidden, heads, layers, k=kfrac)
        params = thdro_params_from_torch(tm.state_dict(), layers)
        j_ref, j_src = ours.apply(
            params, jnp.asarray(ref_pts), jnp.asarray(src_pts),
            jnp.asarray(ref_f), jnp.asarray(src_f),
        )
        np.testing.assert_allclose(np.asarray(j_ref), t2n(t_ref)[0], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(j_src), t2n(t_src)[0], rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------------------
# Sinkhorn OT (reference modules/sinkhorn/learnable_sinkhorn.py:5-70)
# --------------------------------------------------------------------------


class TestSinkhorn:
    def test_forward_parity_masked(self, rng):
        from geotransformer.modules.sinkhorn import (
            LearnableLogOptimalTransport as TorchOT,
        )

        from rdmnet_tpu.nn.sinkhorn import LearnableLogOptimalTransport

        b, m, n, iters = 3, 12, 10, 50
        tm = TorchOT(iters)
        with torch.no_grad():
            tm.alpha.fill_(0.7)
        scores = rng.randn(b, m, n).astype(np.float32)
        row_masks = rng.rand(b, m) > 0.2
        col_masks = rng.rand(b, n) > 0.2
        # every batch element keeps at least 2 valid rows/cols
        row_masks[:, :2] = True
        col_masks[:, :2] = True

        with torch.no_grad():
            t_out = t2n(
                tm(
                    torch.from_numpy(scores),
                    torch.from_numpy(row_masks),
                    torch.from_numpy(col_masks),
                )
            )

        ours = LearnableLogOptimalTransport(iters)
        j_out = np.asarray(
            ours.apply(
                {"params": {"alpha": np.float32(0.7)}},
                jnp.asarray(scores), jnp.asarray(row_masks), jnp.asarray(col_masks),
            )
        )
        # compare on entries that are not -inf sentinels in either
        valid = (t_out > -1e10) & (j_out > -1e10)
        assert valid.sum() > 0.5 * valid.size
        np.testing.assert_allclose(j_out[valid], t_out[valid], rtol=1e-4, atol=1e-4)
        # the sentinel sets themselves agree
        np.testing.assert_array_equal(t_out > -1e10, j_out > -1e10)


# --------------------------------------------------------------------------
# LocalGlobalRegistration (reference modules/geotransformer/
# local_global_registration.py:11-243)
# --------------------------------------------------------------------------


def _lgr_problem(rng, p=6, k=16, noise=0.02):
    """Patches of noisy true correspondences + a plausible log-score matrix."""
    from tests.test_ops_core import random_transform
    from rdmnet_tpu.ops.geometry import apply_transform
    import jax.numpy as jnp

    tf = random_transform(rng, max_angle=0.5, max_trans=2.0)
    ref_knn = rng.randn(p, k, 3).astype(np.float32) * 5
    src_knn = np.asarray(
        apply_transform(jnp.asarray(ref_knn), jnp.asarray(np.linalg.inv(tf)))
    ) + rng.randn(p, k, 3).astype(np.float32) * noise
    masks = rng.rand(p, k) > 0.15
    masks[:, :4] = True
    # log scores: diagonal strong with per-entry jitter, off-diagonal weak
    scores = (rng.randn(p, k + 1, k + 1) * 0.3 - 6.0).astype(np.float32)
    for i in range(k):
        scores[:, i, i] = -0.5 + 0.2 * rng.randn(p)
    return tf, ref_knn, src_knn, masks, scores


class TestLGRParity:
    @pytest.mark.parametrize(
        "topk,mutual,limit",
        [(1, False, None), (3, False, None), (2, True, None), (1, False, 48)],
    )
    def test_forward_parity(self, rng, topk, mutual, limit):
        from geotransformer.modules.geotransformer.local_global_registration import (
            LocalGlobalRegistration as TorchLGR,
        )

        from rdmnet_tpu.config import FineMatchingConfig
        from rdmnet_tpu.ops.lgr import local_to_global_registration

        p, k = 6, 16
        tf, ref_knn, src_knn, masks, scores = _lgr_problem(rng, p, k)

        tm = TorchLGR(
            k=topk, acceptance_radius=0.6, mutual=mutual,
            confidence_threshold=0.0, use_dustbin=True,
            correspondence_threshold=3, correspondence_limit=limit,
            num_refinement_steps=5,
        )
        with torch.no_grad():
            t_ref_corr, t_src_corr, t_scores, t_tf = tm(
                torch.from_numpy(ref_knn), torch.from_numpy(src_knn),
                torch.from_numpy(masks), torch.from_numpy(masks),
                torch.from_numpy(scores), torch.ones(p),
            )

        cfg = FineMatchingConfig(
            topk=topk, acceptance_radius=0.6, mutual=mutual,
            confidence_threshold=0.0, use_dustbin=True,
            correspondence_threshold=3, correspondence_limit=limit,
            num_refinement_steps=5,
        )
        corr, j_tf = local_to_global_registration(
            jnp.asarray(ref_knn), jnp.asarray(src_knn),
            jnp.asarray(masks), jnp.asarray(masks),
            jnp.asarray(scores), jnp.asarray(np.ones(p, bool)), cfg,
        )

        # the extracted dense correspondence multisets agree
        def corr_set(r, s, w):
            return {
                (round(float(a[0]), 4), round(float(a[1]), 4),
                 round(float(b[0]), 4), round(float(b[1]), 4),
                 round(float(c), 4))
                for a, b, c in zip(r, s, w)
            }

        t_set = corr_set(t2n(t_ref_corr), t2n(t_src_corr), t2n(t_scores))
        keep = np.asarray(corr.scores) > 0
        j_set = corr_set(
            np.asarray(corr.ref_points)[keep],
            np.asarray(corr.src_points)[keep],
            np.asarray(corr.scores)[keep],
        )
        assert j_set == t_set

        np.testing.assert_allclose(np.asarray(j_tf), t2n(t_tf), rtol=1e-3, atol=1e-4)
        # and both recover the planted pose
        np.testing.assert_allclose(np.asarray(j_tf), tf, atol=0.05)


# --------------------------------------------------------------------------
# WeightedProcrustes (reference modules/registration/procrustes.py:6-91)
# --------------------------------------------------------------------------


class TestProcrustes:
    def test_forward_parity(self, rng):
        from geotransformer.modules.registration.procrustes import (
            weighted_procrustes as torch_procrustes,
        )

        from rdmnet_tpu.ops.procrustes import weighted_procrustes

        b, n = 4, 30
        from tests.test_ops_core import random_transform

        src = rng.randn(b, n, 3).astype(np.float32) * 5
        ref = np.stack([
            (src[i] @ random_transform(rng)[ :3, :3].T) + rng.randn(3).astype(np.float32)
            for i in range(b)
        ]).astype(np.float32) + rng.randn(b, n, 3).astype(np.float32) * 0.05
        w = rng.rand(b, n).astype(np.float32)
        w[:, -5:] = 0.0  # padded correspondences

        t_tf = t2n(
            torch_procrustes(
                torch.from_numpy(src), torch.from_numpy(ref),
                torch.from_numpy(w), weight_thresh=0.1, return_transform=True,
            )
        )
        j_tf = np.asarray(
            weighted_procrustes(
                jnp.asarray(src), jnp.asarray(ref), jnp.asarray(w),
                weight_thresh=0.1,
            )
        )
        np.testing.assert_allclose(j_tf, t_tf, rtol=1e-3, atol=1e-4)


# --------------------------------------------------------------------------
# GT node correspondences + vote mask + coarse matching
# (reference geotransformer/modules/registration/matching.py:252-504,
#  geotransformer/modules/geotransformer/superpoint_matching.py:7-83)
# --------------------------------------------------------------------------


class TestGtCorrespondenceParity:
    def _patches(self, rng, m, n, k):
        from tests.test_ops_core import random_transform

        tf = random_transform(rng, max_angle=0.6, max_trans=2.0)
        inv = np.linalg.inv(tf)
        ref_nodes = (rng.rand(m, 3) * 12).astype(np.float32)
        src_nodes = np.empty((n, 3), np.float32)
        half = n // 2
        src_nodes[:half] = (ref_nodes[:half] + rng.randn(half, 3) * 0.3) @ inv[:3, :3].T + inv[:3, 3]
        src_nodes[half:] = ((rng.rand(n - half, 3) * 12) @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
        ref_knn = ref_nodes[:, None] + rng.randn(m, k, 3).astype(np.float32) * 0.5
        src_knn = src_nodes[:, None] + rng.randn(n, k, 3).astype(np.float32) * 0.5
        ref_km = rng.rand(m, k) < 0.9
        src_km = rng.rand(n, k) < 0.9
        ref_km[:, 0] = True
        src_km[:, 0] = True
        return tf, ref_nodes, src_nodes, ref_knn, src_knn, ref_km, src_km

    def test_node_overlap_parity(self, rng):
        """Dense overlap matrix == the reference's sparse (indices,
        overlaps) output of get_node_correspondences on the same patches."""
        from geotransformer.modules.registration.matching import (
            get_node_correspondences,
        )

        from rdmnet_tpu.ops.correspondences import node_correspondence_overlaps

        m, n, k = 24, 20, 10
        tf, rn, sn, rk, sk, rkm, skm = self._patches(rng, m, n, k)
        radius = 0.6
        idx, ov = get_node_correspondences(
            torch.from_numpy(rn), torch.from_numpy(sn),
            torch.from_numpy(rk), torch.from_numpy(sk),
            torch.from_numpy(tf), radius,
            ref_knn_masks=torch.from_numpy(rkm),
            src_knn_masks=torch.from_numpy(skm),
        )
        want = np.zeros((m, n), np.float32)
        want[idx[:, 0].numpy(), idx[:, 1].numpy()] = ov.numpy()

        got = np.asarray(node_correspondence_overlaps(
            jnp.asarray(rn), jnp.asarray(sn), jnp.asarray(rk), jnp.asarray(sk),
            jnp.asarray(tf), radius,
            jnp.ones((m,), bool), jnp.ones((n,), bool),
            jnp.asarray(rkm), jnp.asarray(skm),
        ))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_vote_mask_parity(self, rng):
        """mutual_nearest_node_masks == get_node_correspondences_disance."""
        from geotransformer.modules.registration.matching import (
            get_node_correspondences_disance,
        )

        from rdmnet_tpu.ops.correspondences import mutual_nearest_node_masks

        m, n, k = 30, 26, 8
        tf, rn, sn, _, _, _, _ = self._patches(rng, m, n, k)
        radius = 1.2  # reference compares squared dist vs unsquared radius
        want = get_node_correspondences_disance(
            torch.from_numpy(rn), torch.from_numpy(sn),
            torch.from_numpy(tf), radius,
        ).numpy()
        got = np.asarray(mutual_nearest_node_masks(
            jnp.asarray(rn), jnp.asarray(sn), jnp.asarray(tf), radius,
            jnp.ones((m,), bool), jnp.ones((n,), bool),
        ))
        np.testing.assert_array_equal(got, want)

    def test_superpoint_matching_parity(self, rng):
        """Top-k dual-normalized coarse matching == reference
        SuperPointMatching on the same features (sets + scores)."""
        from geotransformer.modules.geotransformer.superpoint_matching import (
            SuperPointMatching,
        )

        from rdmnet_tpu.nn.matching import superpoint_matching

        m, n, c, topk = 40, 36, 16, 24
        rf = rng.randn(m, c).astype(np.float32)
        rf /= np.linalg.norm(rf, axis=1, keepdims=True)
        sf = rng.randn(n, c).astype(np.float32)
        sf /= np.linalg.norm(sf, axis=1, keepdims=True)

        tm = SuperPointMatching(topk, dual_normalization=True)
        t_ref, t_src, t_scores = tm(torch.from_numpy(rf), torch.from_numpy(sf))

        j_ref, j_src, j_scores, valid = superpoint_matching(
            jnp.asarray(rf), jnp.asarray(sf),
            jnp.ones((m,), bool), jnp.ones((n,), bool),
            num_correspondences=topk, dual_normalization=True, exact=True,
        )
        assert bool(np.asarray(valid).all())
        want = {(int(a), int(b)) for a, b in zip(t_ref.numpy(), t_src.numpy())}
        got = {(int(a), int(b)) for a, b in zip(np.asarray(j_ref), np.asarray(j_src))}
        assert got == want
        np.testing.assert_allclose(
            np.sort(np.asarray(j_scores)), np.sort(t_scores.numpy()), rtol=1e-4
        )


# --------------------------------------------------------------------------
# Conditional transformer ablation stacks
# (reference modules/transformer/conditional_transformer.py:14-70,
#  pe_transformer.py:15-132)
# --------------------------------------------------------------------------
def cond_params_from_torch(sd, blocks, pe=False):
    """Conditional-stack state_dict (layers.{i}.*) -> our per-type-indexed
    flax tree (self_0, cross_0, self_1, ... — the torch_convert scheme)."""
    p = {}
    counts = {}
    for i, block in enumerate(blocks):
        name = f"{block}_{counts.get(block, 0)}"
        counts[block] = counts.get(block, 0) + 1
        pre = f"layers.{i}"
        att = {
            "proj_q": lin(sd, f"{pre}.attention.attention.proj_q"),
            "proj_k": lin(sd, f"{pre}.attention.attention.proj_k"),
            "proj_v": lin(sd, f"{pre}.attention.attention.proj_v"),
        }
        if pe and block == "self":
            att["proj_p"] = lin(sd, f"{pre}.attention.attention.proj_p")
        p[name] = {
            "attention": att,
            "linear": lin(sd, f"{pre}.attention.linear"),
            "norm": norm(sd, f"{pre}.attention.norm"),
            "output": {
                "expand": lin(sd, f"{pre}.output.expand"),
                "squeeze": lin(sd, f"{pre}.output.squeeze"),
                "norm": norm(sd, f"{pre}.output.norm"),
            },
        }
    return {"params": p}


class TestConditionalTransformerParity:
    def test_vanilla_parity(self, rng):
        """Pins the sequential cross-update semantics (feats1's cross sees
        the UPDATED feats0; conditional_transformer.py:30-36)."""
        from geotransformer.modules.transformer.conditional_transformer import (
            VanillaConditionalTransformer as TorchVanilla,
        )

        from rdmnet_tpu.nn.transformers import VanillaConditionalTransformer

        blocks = ["self", "cross", "self", "cross"]
        d, h, n, m = 32, 4, 18, 14
        tm = TorchVanilla(blocks, d, h).eval()
        rf = rng.randn(n, d).astype(np.float32)
        sf = rng.randn(m, d).astype(np.float32)
        with torch.no_grad():
            t_ref, t_src = tm(torch.from_numpy(rf[None]), torch.from_numpy(sf[None]))

        ours = VanillaConditionalTransformer(tuple(blocks), d, h)
        params = cond_params_from_torch(tm.state_dict(), blocks)
        j_ref, j_src = ours.apply(params, jnp.asarray(rf), jnp.asarray(sf))
        np.testing.assert_allclose(np.asarray(j_ref), t2n(t_ref)[0], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(j_src), t2n(t_src)[0], rtol=1e-4, atol=1e-4)

    def test_pe_parity(self, rng):
        """proj_p-projected embeddings enter q/k only (pe_transformer.py:58-60)."""
        from geotransformer.modules.transformer.conditional_transformer import (
            PEConditionalTransformer as TorchPE,
        )

        from rdmnet_tpu.nn.transformers import PEConditionalTransformer

        blocks = ["self", "cross", "self", "cross"]
        d, h, n, m = 32, 4, 18, 14
        tm = TorchPE(blocks, d, h).eval()
        rf = rng.randn(n, d).astype(np.float32)
        sf = rng.randn(m, d).astype(np.float32)
        re_ = rng.randn(n, d).astype(np.float32)
        se = rng.randn(m, d).astype(np.float32)
        with torch.no_grad():
            t_ref, t_src = tm(
                torch.from_numpy(rf[None]), torch.from_numpy(sf[None]),
                torch.from_numpy(re_[None]), torch.from_numpy(se[None]),
            )

        ours = PEConditionalTransformer(tuple(blocks), d, h)
        params = cond_params_from_torch(tm.state_dict(), blocks, pe=True)
        j_ref, j_src = ours.apply(
            params, jnp.asarray(rf), jnp.asarray(sf), jnp.asarray(re_), jnp.asarray(se)
        )
        np.testing.assert_allclose(np.asarray(j_ref), t2n(t_ref)[0], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(j_src), t2n(t_src)[0], rtol=1e-4, atol=1e-4)


class TestNeighborLimitRule:
    def test_matches_reference_cumsum_rule(self, rng):
        """limit_from_counts == the reference's histogram cumsum rule
        (utils/data.py:217-218) on arbitrary count distributions."""
        from rdmnet_tpu.data.calibration import limit_from_counts

        def reference_rule(counts, keep_ratio, hist_n):
            hist = np.bincount(counts, minlength=hist_n)[:hist_n]
            cum = np.cumsum(hist)
            return int(np.sum(cum < keep_ratio * cum[-1]))

        for counts in [
            np.array([3, 3, 3, 5]),
            np.array([3, 3, 3, 3, 5]),
            np.array([30] * 100),
            rng.randint(0, 50, size=1000),
            rng.poisson(20, size=777),
        ]:
            counts = counts.astype(np.int64)
            for keep in (0.5, 0.8, 0.9, 1.0):
                want = reference_rule(counts, keep, int(counts.max()) + 2)
                got = limit_from_counts(counts, keep)
                assert got == want, (counts[:8], keep, got, want)


class TestThDRoFormerPadded:
    def test_topk_attention_parity_padded(self, rng):
        """The dynamic top-k count must follow the VALID node count
        (reference dynamic_attention k = int(n * frac), thdroformer.py:27),
        not the padded capacity — otherwise sparsification silently turns
        dense whenever the cloud underfills its bucket."""
        from rdmnet.thdroformer.thdroformer import ThDRoFormer as TorchThDRo

        from rdmnet_tpu.nn.thdroformer import ThDRoFormer

        din, dout, hidden, heads, layers = 32, 32, 32, 4, 2
        n, m, cap = 24, 20, 32
        kfrac = (0.5, 0.75)
        tm = TorchThDRo(din, dout, hidden, heads, layers, k=list(kfrac)).eval()

        ref_pts = (rng.rand(n, 3) * 10).astype(np.float32)
        src_pts = (rng.rand(m, 3) * 10).astype(np.float32)
        ref_f = rng.randn(n, din).astype(np.float32)
        src_f = rng.randn(m, din).astype(np.float32)

        with torch.no_grad():
            t_ref, t_src = tm(
                torch.from_numpy(ref_pts[None]), torch.from_numpy(src_pts[None]),
                torch.from_numpy(ref_f[None]), torch.from_numpy(src_f[None]),
            )

        def pad(x, cap, fill):
            out = np.full((cap,) + x.shape[1:], fill, x.dtype)
            out[: len(x)] = x
            return jnp.asarray(out)

        ours = ThDRoFormer(din, dout, hidden, heads, layers, k=kfrac)
        params = thdro_params_from_torch(tm.state_dict(), layers)
        j_ref, j_src = ours.apply(
            params,
            pad(ref_pts, cap, 1e6), pad(src_pts, cap, 1e6),
            pad(ref_f, cap, 0.0), pad(src_f, cap, 0.0),
            ref_valid=jnp.arange(cap) < n, src_valid=jnp.arange(cap) < m,
        )
        np.testing.assert_allclose(np.asarray(j_ref)[:n], t2n(t_ref)[0], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(j_src)[:m], t2n(t_src)[0], rtol=1e-4, atol=1e-4)


class TestAPETransformerParity:
    def test_forward_parity(self, rng):
        """APE ablation = posEmbedding2 + PEConditionalTransformer
        (reference thdroformer.py:368-448): embeddings enter q/k via the
        shared proj_p only."""
        from rdmnet.thdroformer.thdroformer import APETransformer as TorchAPE

        from rdmnet_tpu.nn.thdroformer import APETransformer

        din, dout, hidden, heads, layers = 48, 32, 32, 4, 2
        n, m = 22, 18
        blocks = ["self", "cross"] * layers
        tm = TorchAPE(din, dout, hidden, blocks, heads).eval()

        ref_pts = (rng.rand(n, 3) * 10).astype(np.float32)
        src_pts = (rng.rand(m, 3) * 10).astype(np.float32)
        ref_f = rng.randn(n, din).astype(np.float32)
        src_f = rng.randn(m, din).astype(np.float32)

        with torch.no_grad():
            t_ref, t_src = tm(
                torch.from_numpy(ref_pts[None]), torch.from_numpy(src_pts[None]),
                torch.from_numpy(ref_f[None]), torch.from_numpy(src_f[None]),
            )

        sd = tm.state_dict()
        inner = {k[len("transformer."):]: v for k, v in sd.items()
                 if k.startswith("transformer.")}
        params = {"params": {
            "embedding": lin(sd, "embedding.proj"),
            "in_proj": lin(sd, "in_proj"),
            "out_proj": lin(sd, "out_proj"),
            "transformer": cond_params_from_torch(inner, blocks, pe=True)["params"],
        }}
        ours = APETransformer(din, dout, hidden, heads, layers)
        j_ref, j_src = ours.apply(
            params, jnp.asarray(ref_pts), jnp.asarray(src_pts),
            jnp.asarray(ref_f), jnp.asarray(src_f),
        )
        np.testing.assert_allclose(np.asarray(j_ref), t2n(t_ref)[0], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(j_src), t2n(t_src)[0], rtol=1e-4, atol=1e-4)


@pytest.mark.slow
class TestConvertCLI:
    def test_convert_checkpoint_roundtrip(self, tmp_path):
        """cli/convert writes an orbax snapshot from a reference .pth.tar
        that the standard CheckpointManager path restores, with the torch
        weights mapped onto the flax tree (spot-checked leaf-for-leaf)."""
        import sys

        sys.path.insert(0, "/root/reference/experiments")
        from model_infer import create_model
        from config import make_cfg as ref_make_cfg

        from rdmnet_tpu.cli.convert import convert_checkpoint
        from rdmnet_tpu.config import make_parity_cfg
        from rdmnet_tpu.engine.checkpoint import CheckpointManager
        from rdmnet_tpu.cli.common import build_model_and_params
        from rdmnet_tpu.engine.train_step import TrainState, create_optimizer

        ref_cfg = ref_make_cfg()
        # injected at runtime by the reference CLIs (trainval.py:22)
        ref_cfg.neighbor_limits = [65, 63, 69, 71, 81]
        tm = create_model(ref_cfg)
        sd = tm.state_dict()
        blob_path = str(tmp_path / "ref.pth.tar")
        torch.save({"model": sd, "epoch": 42}, blob_path)

        cfg = make_parity_cfg()
        out_dir = str(tmp_path / "snap")
        step = convert_checkpoint(cfg, blob_path, out_dir)
        assert step == 42

        # restore through the standard manager using a same-shape template
        model, params = build_model_and_params(cfg, torch_checkpoint=blob_path)
        tx, _ = create_optimizer(cfg, steps_per_epoch=1000)
        template = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
        mgr = CheckpointManager(out_dir)
        restored, meta = mgr.restore(template, step=42)
        assert meta["epoch"] == 42 and meta["requires_parity_cfg"] is True

        got = np.asarray(
            restored.params["params"]["transformer"]["in_proj"]["kernel"]
        )
        want = t2n(sd["transformer.in_proj.weight"]).T
        np.testing.assert_array_equal(got, want)


@pytest.mark.slow
class TestExportStateDict:
    def test_full_model_round_trip_key_for_key(self):
        """export_state_dict is the exact inverse of convert_state_dict on
        the FULL live reference model: every key reproduced bit-for-bit
        and accepted by torch load_state_dict(strict=True) — the
        'take a TPU-trained checkpoint back to the reference' path."""
        import sys

        sys.path.insert(0, "/root/reference/experiments")
        from model_infer import create_model
        from config import make_cfg as ref_make_cfg

        from rdmnet_tpu.utils.torch_convert import (
            convert_state_dict,
            export_state_dict,
        )

        ref_cfg = ref_make_cfg()
        ref_cfg.neighbor_limits = [65, 63, 69, 71, 81]
        tm = create_model(ref_cfg)
        sd = {k: t2n(v) for k, v in tm.state_dict().items()}

        params = convert_state_dict(sd)
        back = export_state_dict(params, {k: tuple(v.shape) for k, v in sd.items()})

        assert set(back) == set(sd)
        for k in sd:
            if k.endswith("div_term"):
                # synthesized transcendental buffer: torch/numpy exp may
                # differ in the last ulp; (torch regenerates it anyway)
                np.testing.assert_allclose(back[k], sd[k], rtol=3e-7, err_msg=k)
            else:
                np.testing.assert_array_equal(back[k], sd[k], err_msg=k)

        missing, unexpected = tm.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in back.items()},
            strict=True,
        )
        assert not missing and not unexpected

    def test_shape_mismatch_raises(self):
        from rdmnet_tpu.utils.torch_convert import export_state_dict

        params = {"head": {"kernel": np.zeros((4, 8), np.float32)}}
        with pytest.raises(ValueError, match="shape mismatch"):
            export_state_dict(params, {"head.weight": (7, 4)})

    def test_missing_key_raises(self):
        from rdmnet_tpu.utils.torch_convert import export_state_dict

        with pytest.raises(KeyError, match="missing"):
            export_state_dict({}, {"head.weight": (8, 4)})

    def test_div_term_synthesis_matches_torch(self):
        from rdmnet_tpu.utils.torch_convert import export_state_dict

        d_model = 64
        div_indices = torch.arange(0, d_model, 2).float()
        want = torch.exp(div_indices * (-np.log(10000.0) / d_model)).numpy()
        got = export_state_dict({}, {"embedding.div_term": (d_model // 2,)})
        np.testing.assert_allclose(got["embedding.div_term"], want, rtol=3e-7)


@pytest.mark.slow
class TestConvertCLIExport:
    def test_import_then_export_matches_original(self, tmp_path):
        """rdmnet-convert both directions: reference .pth.tar -> orbax
        snapshot -> back to .pth.tar equals the original state_dict."""
        import sys

        sys.path.insert(0, "/root/reference/experiments")
        from model_infer import create_model
        from config import make_cfg as ref_make_cfg

        from rdmnet_tpu.cli.convert import convert_checkpoint, export_checkpoint
        from rdmnet_tpu.config import make_parity_cfg

        ref_cfg = ref_make_cfg()
        ref_cfg.neighbor_limits = [65, 63, 69, 71, 81]
        tm = create_model(ref_cfg)
        sd = tm.state_dict()
        blob_path = str(tmp_path / "ref.pth.tar")
        torch.save({"model": sd, "epoch": 7}, blob_path)

        cfg = make_parity_cfg()
        snap_dir = str(tmp_path / "snap")
        convert_checkpoint(cfg, blob_path, snap_dir)

        out_path = str(tmp_path / "exported.pth.tar")
        export_checkpoint(cfg, snap_dir, blob_path, out_path, epoch=7)

        blob = torch.load(out_path, map_location="cpu")
        assert blob["epoch"] == 7
        got = blob["model"]
        assert set(got) == set(sd.keys())
        for k, v in sd.items():
            if k.endswith("div_term"):
                np.testing.assert_allclose(t2n(got[k]), t2n(v), rtol=3e-7)
            else:
                np.testing.assert_array_equal(t2n(got[k]), t2n(v), err_msg=k)
