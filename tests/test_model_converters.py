"""Converter-family tests: each official->mmseg remapper
(tools/model_converters/official_remap.py) run on synthetic state dicts,
asserting the key mapping and tensor munging the reference converters
(``tools/model_converters/*2mmseg.py``) perform."""
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..',
                            'tools', 'model_converters'))

import official_remap as orm  # noqa: E402


def test_convert_vit_keys():
    sd = {
        'cls_token': np.zeros((1, 1, 8)),
        'pos_embed': np.zeros((1, 5, 8)),
        'patch_embed.proj.weight': np.zeros((8, 3, 4, 4)),
        'blocks.0.norm1.weight': np.zeros(8),
        'blocks.0.attn.qkv.weight': np.zeros((24, 8)),
        'blocks.0.attn.proj.weight': np.zeros((8, 8)),
        'blocks.0.mlp.fc1.weight': np.zeros((16, 8)),
        'blocks.0.mlp.fc2.bias': np.zeros(8),
        'norm.weight': np.zeros(8),
        'head.weight': np.zeros((10, 8)),
    }
    out = orm.convert_vit(sd)
    assert 'head.weight' not in out
    assert 'patch_embed.projection.weight' in out
    assert 'layers.0.ln1.weight' in out
    assert 'layers.0.attn.attn.in_proj_weight' in out
    assert 'layers.0.attn.attn.out_proj.weight' in out
    assert 'layers.0.ffn.layers.0.0.weight' in out
    assert 'layers.0.ffn.layers.1.bias' in out
    assert 'ln1.weight' in out
    assert 'cls_token' in out and 'pos_embed' in out


def test_convert_beit_keys():
    sd = {
        'patch_embed.proj.weight': np.zeros((8, 3, 4, 4)),
        'blocks.1.norm2.weight': np.zeros(8),
        'blocks.1.mlp.fc1.weight': np.zeros((16, 8)),
        'blocks.1.attn.q_bias': np.zeros(8),
    }
    out = orm.convert_beit(sd)
    assert 'patch_embed.projection.weight' in out
    assert 'layers.1.ln2.weight' in out
    assert 'layers.1.ffn.layers.0.0.weight' in out
    assert 'layers.1.attn.q_bias' in out


def test_convert_swin_keys_and_unfold():
    rng = np.random.default_rng(0)
    red = rng.standard_normal((4, 8)).astype(np.float32)
    nrm = rng.standard_normal(8).astype(np.float32)
    sd = {
        'patch_embed.proj.weight': np.zeros((8, 3, 4, 4)),
        'layers.0.blocks.0.attn.qkv.weight': np.zeros((24, 8)),
        'layers.0.blocks.0.mlp.fc1.weight': np.zeros((16, 8)),
        'layers.0.downsample.reduction.weight': red,
        'layers.0.downsample.norm.weight': nrm,
        'head.bias': np.zeros(10),
    }
    out = orm.convert_swin(sd)
    assert 'stages.0.blocks.0.attn.w_msa.qkv.weight' in out
    assert 'stages.0.blocks.0.ffn.layers.0.0.weight' in out
    assert 'head.bias' not in out
    # unfold-order correction: [0,1,2,3] quadrants -> [0,2,1,3], transposed
    got = out['stages.0.downsample.reduction.weight']
    want = red.reshape(4, 4, 2)[:, [0, 2, 1, 3], :].transpose(0, 2, 1) \
              .reshape(4, 8)
    np.testing.assert_allclose(got, want)
    got_n = out['stages.0.downsample.norm.weight']
    want_n = nrm.reshape(4, 2)[[0, 2, 1, 3]].T.reshape(8)
    np.testing.assert_allclose(got_n, want_n)


def test_convert_mit_qkv_concat_and_ffn_conv():
    q = np.ones((8, 8), np.float32)
    kv = np.full((16, 8), 2.0, np.float32)
    sd = {
        'patch_embed1.proj.weight': np.zeros((8, 3, 7, 7)),
        'block1.0.attn.q.weight': q,
        'block1.0.attn.kv.weight': kv,
        'block1.0.attn.proj.weight': np.zeros((8, 8)),
        'block1.0.mlp.fc1.weight': np.zeros((16, 8)),
        'block1.0.mlp.dwconv.dwconv.weight': np.zeros((16, 1, 3, 3)),
        'block1.0.mlp.fc2.weight': np.zeros((8, 16)),
        'norm1.weight': np.zeros(8),
        'head.weight': np.zeros((10, 8)),
    }
    out = orm.convert_mit(sd)
    assert 'layers.0.0.projection.weight' in out
    inp = out['layers.0.0.projection.weight']
    assert inp.shape == (8, 3, 7, 7)
    w = out['layers.0.1.0.attn.attn.in_proj_weight']
    assert w.shape == (24, 8)
    np.testing.assert_allclose(w[:8], q)
    np.testing.assert_allclose(w[8:], kv)
    assert not any('attn.kv.' in k for k in out)
    # FFN linears become 1x1 convs
    assert out['layers.0.1.0.ffn.layers.0.weight'].shape == (16, 8, 1, 1)
    assert out['layers.0.1.0.ffn.layers.4.weight'].shape == (8, 16, 1, 1)
    assert 'layers.0.1.0.ffn.layers.1.weight' in out
    assert 'layers.0.2.weight' in out


def test_convert_stdc_keys():
    sd = {
        'cp.features.0.conv.weight': np.zeros((8, 3, 3, 3)),
        'cp.features.2.conv_list.0.conv.weight': np.zeros((8, 8, 1, 1)),
        'cp.features.2.avd_layer.0.weight': np.zeros((8, 1, 3, 3)),
        'cp.features.2.avd_layer.1.weight': np.zeros(8),
        'fc.weight': np.zeros((1000, 8)),
    }
    out = orm.convert_stdc(sd, 'STDC1')
    assert 'stages.0.conv.weight' in out
    assert 'stages.2.0.layers.0.conv.weight' in out
    assert 'stages.2.0.downsample.conv.weight' in out
    assert 'stages.2.0.downsample.bn.weight' in out
    assert 'fc.weight' not in out


def test_convert_twins_pcpvt_vs_svt():
    q = np.ones((8, 8), np.float32)
    kv = np.full((16, 8), 3.0, np.float32)
    sd = {
        'patch_embeds.0.proj.weight': np.zeros((8, 3, 4, 4)),
        'blocks.0.0.attn.q.weight': q,
        'blocks.0.0.attn.kv.weight': kv,
        'blocks.0.0.attn.proj.weight': np.zeros((8, 8)),
        'blocks.0.1.attn.proj.weight': np.zeros((8, 8)),
        'blocks.0.0.mlp.fc1.weight': np.zeros((16, 8)),
        'pos_block.0.proj.0.weight': np.zeros((8, 1, 3, 3)),
        'head.weight': np.zeros((10, 8)),
    }
    out_p = orm.convert_twins(sd, 'pcpvt')
    w = out_p['layers.0.0.attn.attn.in_proj_weight']
    assert w.shape == (24, 8)
    assert 'layers.0.0.attn.attn.out_proj.weight' in out_p
    assert 'layers.0.1.attn.attn.out_proj.weight' in out_p
    assert 'position_encodings.0.proj.weight' in out_p
    out_s = orm.convert_twins(sd, 'svt')
    # svt: even blocks keep the raw proj (LSA), odd get wrapped MHA naming
    assert 'layers.0.0.attn.proj.weight' in out_s
    assert 'layers.0.1.attn.attn.out_proj.weight' in out_s


def _clip_like_sd():
    sd = {
        'visual.class_embedding': np.zeros(8),
        'visual.positional_embedding': np.zeros((5, 8)),
        'visual.conv1.weight': np.zeros((8, 3, 4, 4)),
        'visual.ln_pre.weight': np.zeros(8),
        'visual.proj': np.zeros((8, 4)),
        'visual.ln_post.weight': np.zeros(8),
        'positional_embedding': np.zeros((7, 8)),
        'text_projection': np.zeros((8, 8)),
        'token_embedding.weight': np.zeros((100, 8)),
        'logit_scale': np.zeros(()),
    }
    for i in range(3):
        for blk, val in (('ln_1.weight', np.zeros(8)),
                         ('attn.in_proj_weight', np.zeros((24, 8))),
                         ('attn.out_proj.weight', np.zeros((8, 8))),
                         ('ln_2.bias', np.zeros(8)),
                         ('mlp.c_fc.weight', np.zeros((16, 8))),
                         ('mlp.c_proj.weight', np.zeros((8, 16)))):
            sd[f'visual.transformer.resblocks.{i}.{blk}'] = val
    sd['transformer.resblocks.0.attn.in_proj_weight'] = np.zeros((24, 8))
    sd['transformer.resblocks.0.mlp.c_fc.weight'] = np.zeros((16, 8))
    return sd


def test_convert_clip_split_and_reshape():
    out = orm.convert_clip(_clip_like_sd(), visual_split=2)
    # tower blocks 0-1 -> image encoder; block 2 -> rec head layer 0
    assert 'image_encoder.layers.0.ln1.weight' in out
    assert 'image_encoder.layers.1.attn.attn.in_proj_weight' in out
    assert 'decode_head.rec_with_attnbias.layers.0.attentions.0.attn.' \
           'in_proj_weight' in out
    assert 'decode_head.rec_with_attnbias.layers.0.ffns.0.layers.0.0.' \
           'weight' in out
    assert out['image_encoder.cls_token'].shape == (1, 1, 8)
    assert out['image_encoder.pos_embed'].shape == (1, 5, 8)
    assert out['decode_head.rec_with_attnbias.proj.weight'].shape == (4, 8)
    assert 'text_encoder.transformer.0.attentions.0.attn.in_proj_weight' in out
    assert 'text_encoder.token_embedding.weight' in out


def test_convert_san_keys():
    sd = {
        'clip_visual_extractor.class_embedding': np.zeros(8),
        'clip_visual_extractor.positional_embedding': np.zeros((5, 8)),
        'clip_visual_extractor.conv1.weight': np.zeros((8, 3, 4, 4)),
        'clip_visual_extractor.resblocks.0.ln_1.weight': np.zeros(8),
        'clip_visual_extractor.resblocks.0.mlp.c_fc.weight':
            np.zeros((16, 8)),
        'side_adapter_network.vit_model.blocks.0.norm1.weight': np.zeros(8),
        'side_adapter_network.vit_model.blocks.0.attn.qkv.weight':
            np.zeros((24, 8)),
        'side_adapter_network.vit_model.blocks.0.mlp.fc1.weight':
            np.zeros((16, 8)),
        'side_adapter_network.vit_model.pos_embed': np.zeros((1, 5, 8)),
        'side_adapter_network.vit_model.patch_embed.proj.weight':
            np.zeros((8, 3, 4, 4)),
        'side_adapter_network.query_embed': np.zeros((10, 8)),
        'side_adapter_network.fusion_layers.layer1.input_proj.0.weight':
            np.zeros((8, 8, 1, 1)),
        'side_adapter_network.mask_decoder.q.weight': np.zeros((8, 8)),
        'clip_rec_head.proj': np.zeros((8, 4)),
        'clip_rec_head.ln_post.weight': np.zeros(8),
        'clip_rec_head.resblocks.0.ln_1.weight': np.zeros(8),
        'ov_classifier.transformer.resblocks.0.mlp.c_proj.weight':
            np.zeros((8, 16)),
        'ov_classifier.logit_scale': np.zeros(()),
    }
    out = orm.convert_san(sd)
    assert 'image_encoder.layers.0.ln1.weight' in out
    assert 'image_encoder.layers.0.ffn.layers.0.0.weight' in out
    assert ('decode_head.side_adapter_network.encode_layers.0.'
            'attn.attn.in_proj_weight') in out
    assert ('decode_head.side_adapter_network.encode_layers.0.'
            'ffn.layers.0.0.weight') in out
    assert 'decode_head.side_adapter_network.conv_clips.1.0.weight' in out
    assert 'decode_head.side_adapter_network.mask_decoder.q.weight' in out
    assert out['decode_head.rec_with_attnbias.proj.weight'].shape == (4, 8)
    assert 'decode_head.rec_with_attnbias.layers.0.norms.0.weight' in out
    assert ('text_encoder.transformer.0.ffns.0.layers.1.weight') in out
    assert 'text_encoder.logit_scale' in out


def test_convert_vitjax_shapes():
    rng = np.random.default_rng(0)
    e, heads, hd, n = 8, 2, 4, 1
    w = {
        'embedding/kernel': rng.standard_normal((4, 4, 3, e)),
        'embedding/bias': np.zeros(e),
        'Transformer/posembed_input/pos_embedding':
            np.zeros((1, 5, e)),
        'cls': np.zeros((1, 1, e)),
        'Transformer/encoder_norm/scale': np.ones(e),
        'Transformer/encoder_norm/bias': np.zeros(e),
    }
    jb = 'Transformer/encoderblock_0'
    msa = f'{jb}/MultiHeadDotProductAttention_1'
    w[f'{jb}/LayerNorm_0/scale'] = np.ones(e)
    w[f'{jb}/LayerNorm_0/bias'] = np.zeros(e)
    w[f'{jb}/LayerNorm_2/scale'] = np.ones(e)
    w[f'{jb}/LayerNorm_2/bias'] = np.zeros(e)
    for nme in ('query', 'key', 'value'):
        w[f'{msa}/{nme}/kernel'] = rng.standard_normal((e, heads, hd))
        w[f'{msa}/{nme}/bias'] = np.zeros((heads, hd))
    w[f'{msa}/out/kernel'] = rng.standard_normal((heads, hd, e))
    w[f'{msa}/out/bias'] = np.zeros(e)
    w[f'{jb}/MlpBlock_3/Dense_0/kernel'] = rng.standard_normal((e, 2 * e))
    w[f'{jb}/MlpBlock_3/Dense_0/bias'] = np.zeros(2 * e)
    w[f'{jb}/MlpBlock_3/Dense_1/kernel'] = rng.standard_normal((2 * e, e))
    w[f'{jb}/MlpBlock_3/Dense_1/bias'] = np.zeros(e)
    out = orm.convert_vitjax(w, num_layer=n)
    assert out['patch_embed.projection.weight'].shape == (e, 3, 4, 4)
    assert out['layers.0.attn.attn.in_proj_weight'].shape == (3 * e, e)
    assert out['layers.0.attn.attn.in_proj_bias'].shape == (3 * e,)
    assert out['layers.0.attn.attn.out_proj.weight'].shape == (e, e)
    assert out['layers.0.ffn.layers.0.0.weight'].shape == (2 * e, e)
    assert out['layers.0.ffn.layers.1.weight'].shape == (e, 2 * e)
    # q slice of in_proj matches the jax query kernel (transposed)
    np.testing.assert_allclose(
        out['layers.0.attn.attn.in_proj_weight'][:e],
        w[f'{msa}/query/kernel'].reshape(e, e).T)


def test_cli_roundtrip_via_torch(tmp_path):
    import subprocess
    import torch
    src = tmp_path / 'official.pth'
    sd = {'blocks.0.mlp.fc1.weight': torch.zeros(16, 8),
          'norm.weight': torch.zeros(8)}
    torch.save(sd, src)
    dst = tmp_path / 'mmseg.pth'
    script = osp.join(osp.dirname(osp.abspath(__file__)), '..', 'tools',
                      'model_converters', 'vit2jax.py')
    res = subprocess.run([sys.executable, script, str(src), str(dst)],
                         capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    out = torch.load(dst, weights_only=True)
    assert 'layers.0.ffn.layers.0.0.weight' in out
    assert 'ln1.weight' in out
