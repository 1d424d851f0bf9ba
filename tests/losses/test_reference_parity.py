"""Numeric parity goldens generated from the TF reference library.

Each golden below was produced by running /root/reference's own
implementation (TF 2.21 + legacy keras) on the fixed inputs embedded
here — see the generation provenance in the module docstring of each
test.  These pin the TPU rewrite to the reference's exact semantics,
including the subtle cases (occurrence-power pair weighting, sample
masks, wrong-order filtering, custom label-pair weight functions).

Generated once at build time with numpy RandomState(42) inputs; the
reference functions exercised: pairwise_loss_from_batch.pairwise_loss,
listwise_loss_from_batch.to_listwise_sample + softmax-CE loss,
focal_loss.focal_crossentropy_loss, attention.attention_by_dot_product,
embedding_wise_weight.gather_embedding_element_wise_weight,
pairwise_loss_from_batch.occurance_power_weight.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from rec_now_tpu.losses import (pairwise_loss, listwise_loss,
                                focal_crossentropy_loss,
                                occurance_power_weight)
from rec_now_tpu.rec_block.attention import attention_by_dot_product
from rec_now_tpu.rec_block.embedding_wise_weight import (
    gather_embedding_element_wise_weight)

GOLDENS = {'inputs': {'outputs': [0.49671414494514465, -0.13826429843902588, 0.6476885676383972, 1.5230298042297363, -0.2341533750295639, -0.23413695394992828, 1.5792127847671509, 0.7674347162246704, -0.4694743752479553, 0.5425600409507751, -0.4634176790714264, -0.4657297432422638], 'labels': [0.0, 1.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 1.0], 'groups': [3.0, 0.0, 2.0, 0.0, 2.0, 2.0, 0.0, 0.0, 2.0, 1.0, 3.0, 0.0], 'mask': [True, True, True, False, True, True, False, True, False, True, False, True]}, 'pairwise_default': 1.4710328578948975, 'pairwise_occ_-1': 0.2915393114089966, 'pairwise_occ_0.5': 3.403686046600342, 'pairwise_mask': 1.1638774871826172, 'pairwise_wrong_order': 1.5821129083633423, 'pairwise_num_pair': 9.0, 'pairwise_custom_weight': 2.942065715789795, 'listwise': 2.26179838180542, 'focal_mean': 0.2689097225666046, 'focal_no_mean': [0.28176406025886536, 0.05461674928665161, 0.34538733959198, 0.8696215748786926, 0.06366301327943802, 0.08530688285827637, 0.9107825756072998, 0.40186747908592224, 0.05392320826649666, 0.01547916978597641, 0.05458724871277809, 0.08991733193397522], 'focal_a0.4_g3': 0.1650857925415039, 'attn_inputs': {'user': [[[0.20886360108852386, -1.959670066833496, -1.32818603515625, 0.19686123728752136, 0.7384665608406067], [0.1713682860136032, -0.1156482845544815, -0.3011036813259125, -1.4785219430923462, -0.7198442220687866], [-0.46063876152038574, 1.0571222305297852, 0.3436183035373688, -1.7630401849746704, 0.32408398389816284], [-0.38508227467536926, -0.6769220232963562, 0.6116762757301331, 1.0309995412826538, 0.9312801361083984]], [[-0.8392175436019897, -0.3092123866081238, 0.3312634229660034, 0.9755451083183289, -0.4791742265224457], [-0.18565897643566132, -1.106334924697876, -1.1962065696716309, 0.8125258088111877, 1.3562400341033936], [-0.07201012223958969, 1.003532886505127, 0.3616360127925873, -0.6451197266578674, 0.36139559745788574], [1.538036584854126, -0.03582603856921196, 1.5646436214447021, -2.6197450160980225, 0.8219025135040283]], [[0.08704707026481628, -0.2990073561668396, 0.0917607769370079, -1.9875688552856445, -0.21967189013957977], [0.3571125566959381, 1.4778940677642822, -0.5182701945304871, -0.8084936141967773, -0.501757025718689], [0.9154021143913269, 0.3287511169910431, -0.5297601819038391, 0.513267457485199, 0.09707754850387573], [0.9686449766159058, -0.7020530700683594, -0.3276621401309967, -0.39210814237594604, -1.4635149240493774]]], 'doc': [[0.296120285987854, 0.26105526089668274, 0.00511345686390996, -0.23458713293075562, -1.4153707027435303], [-0.4206453263759613, -0.3427145183086395, -0.8022772669792175, -0.16128571331501007, 0.4040508568286896], [1.886185884475708, 0.17457781732082367, 0.2575503885746002, -0.07444591820240021, -1.9187712669372559]]}, 'attn_mat': [[0.5811467170715332, 4.2256269454956055, 0.5419090986251831, -4.426513195037842, -3.829288959503174], [-1.9288450479507446, -2.2943878173828125, -4.150282382965088, 4.5387067794799805, 1.5017974376678467], [6.332067489624023, -0.1810135841369629, -3.093527317047119, -3.891087770462036, -7.453983783721924]], 'attn_score_sum': [[-1.9145814180374146], [0.1871051788330078], [8.40666389465332]], 'attn_mat_filter_neg': [[0.1929774433374405, -0.058435551822185516, -0.3838807940483093, -2.216932773590088, -0.9655918478965759], [-0.3404770493507385, -2.0288901329040527, -2.193704128265381, 1.4900782108306885, 2.487187147140503], [6.332067489624023, -0.1810135841369629, -3.093527317047119, -3.891087770462036, -7.453983783721924]], 'eww_inputs': {'weights': [[-0.026513874530792236, 0.06023021042346954, 2.4632420539855957], [-0.19236096739768982, 0.3015473484992981, -0.034711770713329315]], 'pos_idx': [0, 0, 1, 2, 2]}, 'eww_out': [[-0.026513874530792236, -0.026513874530792236, 0.06023021042346954, 2.4632420539855957, 2.4632420539855957], [-0.19236096739768982, -0.19236096739768982, 0.3015473484992981, -0.034711770713329315, -0.034711770713329315]], 'occ_weight_inputs': [1.0, 2.0, 2.0, 3.0, 2.0], 'occ_weight_1': [1.0, 3.0, 3.0, 1.0, 3.0], 'occ_weight_-1': [1.0, 0.3333333432674408, 0.3333333432674408, 1.0, 0.3333333432674408]}


def _in(name):
    return jnp.asarray(GOLDENS["inputs"][name], dtype=jnp.float32)


class TestPairwiseParity:
    def test_default(self):
        got = pairwise_loss(_in("outputs"), _in("labels"), _in("groups"))
        assert float(got) == pytest.approx(GOLDENS["pairwise_default"],
                                           abs=2e-5)

    def test_occurance_power_neg1(self):
        got = pairwise_loss(_in("outputs"), _in("labels"), _in("groups"),
                            click_occurance_power=-1.0)
        assert float(got) == pytest.approx(GOLDENS["pairwise_occ_-1"],
                                           abs=2e-5)

    def test_occurance_power_half(self):
        got = pairwise_loss(_in("outputs"), _in("labels"), _in("groups"),
                            click_occurance_power=0.5)
        assert float(got) == pytest.approx(GOLDENS["pairwise_occ_0.5"],
                                           abs=2e-5)

    def test_sample_mask(self):
        mask = jnp.asarray(GOLDENS["inputs"]["mask"])
        got = pairwise_loss(_in("outputs"), _in("labels"), _in("groups"),
                            mask=mask)
        assert float(got) == pytest.approx(GOLDENS["pairwise_mask"],
                                           abs=2e-5)

    def test_wrong_order_only(self):
        got = pairwise_loss(_in("outputs"), _in("labels"), _in("groups"),
                            only_use_wrong_order_pair=True)
        assert float(got) == pytest.approx(
            GOLDENS["pairwise_wrong_order"], abs=2e-5)

    def test_num_pair(self):
        _, n = pairwise_loss(_in("outputs"), _in("labels"), _in("groups"),
                             return_num_pair=True)
        assert float(n) == GOLDENS["pairwise_num_pair"]

    def test_custom_weight_func(self):
        def weight_fn(lp, ln):
            return (lp > ln).astype(jnp.float32) * (lp - ln) * 2.0
        got = pairwise_loss(_in("outputs"), _in("labels"), _in("groups"),
                            label_pair_to_weight_func=weight_fn)
        assert float(got) == pytest.approx(
            GOLDENS["pairwise_custom_weight"], abs=2e-5)


class TestListwiseParity:
    def test_loss(self):
        got = listwise_loss(_in("groups"), _in("labels"), _in("outputs"))
        assert float(got) == pytest.approx(GOLDENS["listwise"], abs=2e-5)


class TestFocalParity:
    def test_mean(self):
        got = focal_crossentropy_loss(_in("labels"), _in("outputs"))
        assert float(got) == pytest.approx(GOLDENS["focal_mean"], abs=2e-5)

    def test_per_sample(self):
        got = focal_crossentropy_loss(_in("labels"), _in("outputs"),
                                      return_mean=False)
        np.testing.assert_allclose(np.asarray(got),
                                   GOLDENS["focal_no_mean"],
                                   rtol=1e-4, atol=1e-6)

    def test_alpha_gamma(self):
        got = focal_crossentropy_loss(_in("labels"), _in("outputs"),
                                      alpha=0.4, gamma=3.0)
        assert float(got) == pytest.approx(GOLDENS["focal_a0.4_g3"],
                                           abs=2e-5)


class TestAttentionParity:
    def test_dot_product(self):
        user = jnp.asarray(GOLDENS["attn_inputs"]["user"], jnp.float32)
        doc = jnp.asarray(GOLDENS["attn_inputs"]["doc"], jnp.float32)
        mat, score = attention_by_dot_product(user, doc)
        np.testing.assert_allclose(np.asarray(mat), GOLDENS["attn_mat"],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(score),
                                   GOLDENS["attn_score_sum"],
                                   rtol=1e-4, atol=1e-5)

    def test_filter_neg(self):
        user = jnp.asarray(GOLDENS["attn_inputs"]["user"], jnp.float32)
        doc = jnp.asarray(GOLDENS["attn_inputs"]["doc"], jnp.float32)
        mat, _ = attention_by_dot_product(user, doc, filter_neg=True)
        np.testing.assert_allclose(np.asarray(mat),
                                   GOLDENS["attn_mat_filter_neg"],
                                   rtol=1e-4, atol=1e-5)


class TestEmbeddingWiseWeightParity:
    def test_expand(self):
        w = jnp.asarray(GOLDENS["eww_inputs"]["weights"], jnp.float32)
        got = gather_embedding_element_wise_weight(
            w, GOLDENS["eww_inputs"]["pos_idx"])
        np.testing.assert_allclose(np.asarray(got), GOLDENS["eww_out"],
                                   rtol=1e-6)


class TestOccuranceWeightParity:
    def test_powers(self):
        gid = jnp.asarray(GOLDENS["occ_weight_inputs"], jnp.float32)
        np.testing.assert_allclose(
            np.asarray(occurance_power_weight(gid, 1.0)),
            GOLDENS["occ_weight_1"], rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(occurance_power_weight(gid, -1.0)),
            GOLDENS["occ_weight_-1"], rtol=1e-6)
