"""Official-checkpoint key remappers (numpy in, numpy out).

Behavioral spec: the reference converter family
``tools/model_converters/{vit,swin,mit,stdc,beit,twins,clip,san,vitjax}2mmseg.py``
— each turns an upstream-official state dict (timm ViT, MSRA Swin, NVlabs
SegFormer, author STDC, BEiT, Twins, OpenAI CLIP, SAN, google/vision_transformer
JAX npz) into the mmseg naming convention. Here the remapped dict is the
intermediate format consumed by ``mmseg2jax.py``, which shape-matches it onto
this framework's flax parameter tree, so the full chain is::

    official ckpt --<arch>2jax.py--> mmseg-style .pth --mmseg2jax.py--> orbax

All functions take and return ``dict[str, np.ndarray]``; the CLIs handle
torch/npz (de)serialization.
"""
from collections import OrderedDict

import numpy as np


def convert_vit(ckpt):
    """timm/deit ViT -> mmseg (reference ``vit2mmseg.py:11-49``)."""
    new_ckpt = OrderedDict()
    for k, v in ckpt.items():
        if k.startswith('head'):
            continue
        if k.startswith('norm'):
            new_k = k.replace('norm.', 'ln1.')
        elif k.startswith('patch_embed'):
            new_k = k.replace('proj', 'projection') if 'proj' in k else k
        elif k.startswith('blocks'):
            if 'norm' in k:
                new_k = k.replace('norm', 'ln')
            elif 'mlp.fc1' in k:
                new_k = k.replace('mlp.fc1', 'ffn.layers.0.0')
            elif 'mlp.fc2' in k:
                new_k = k.replace('mlp.fc2', 'ffn.layers.1')
            elif 'attn.qkv' in k:
                new_k = k.replace('attn.qkv.', 'attn.attn.in_proj_')
            elif 'attn.proj' in k:
                new_k = k.replace('attn.proj', 'attn.attn.out_proj')
            else:
                new_k = k
            new_k = new_k.replace('blocks.', 'layers.')
        else:
            new_k = k
        new_ckpt[new_k] = v
    return new_ckpt


def convert_beit(ckpt):
    """BEiT -> mmseg (reference ``beit2mmseg.py:11-32``). Note the reference
    emits patch_embed keys twice (both branches run); we keep the remapped
    one only."""
    new_ckpt = OrderedDict()
    for k, v in ckpt.items():
        if k.startswith('patch_embed'):
            new_k = k.replace('patch_embed.proj', 'patch_embed.projection')
        elif k.startswith('blocks'):
            new_k = k.replace('blocks', 'layers')
            if 'norm' in new_k:
                new_k = new_k.replace('norm', 'ln')
            elif 'mlp.fc1' in new_k:
                new_k = new_k.replace('mlp.fc1', 'ffn.layers.0.0')
            elif 'mlp.fc2' in new_k:
                new_k = new_k.replace('mlp.fc2', 'ffn.layers.1')
        else:
            new_k = k
        new_ckpt[new_k] = v
    return new_ckpt


def _swin_unfold_reduction(x):
    out_channel, in_channel = x.shape
    x = x.reshape(out_channel, 4, in_channel // 4)
    return x[:, [0, 2, 1, 3], :].transpose(0, 2, 1).reshape(
        out_channel, in_channel)


def _swin_unfold_norm(x):
    in_channel = x.shape[0]
    x = x.reshape(4, in_channel // 4)
    return x[[0, 2, 1, 3], :].T.reshape(in_channel)


def convert_swin(ckpt):
    """Official Swin -> mmseg (reference ``swin2mmseg.py:11-62``), including
    the patch-merging unfold-order correction (HW-major -> window-major)."""
    new_ckpt = OrderedDict()
    for k, v in ckpt.items():
        if k.startswith('head'):
            continue
        new_v = v
        if k.startswith('layers'):
            if 'attn.' in k:
                new_k = k.replace('attn.', 'attn.w_msa.')
            elif 'mlp.fc1.' in k:
                new_k = k.replace('mlp.fc1.', 'ffn.layers.0.0.')
            elif 'mlp.fc2.' in k:
                new_k = k.replace('mlp.fc2.', 'ffn.layers.1.')
            elif 'mlp.' in k:
                new_k = k.replace('mlp.', 'ffn.')
            elif 'downsample' in k:
                new_k = k
                if 'reduction.' in k:
                    new_v = _swin_unfold_reduction(v)
                elif 'norm.' in k:
                    new_v = _swin_unfold_norm(v)
            else:
                new_k = k
            new_k = new_k.replace('layers', 'stages', 1)
        elif k.startswith('patch_embed'):
            new_k = k.replace('proj', 'projection') if 'proj' in k else k
        else:
            new_k = k
        new_ckpt[new_k] = new_v
    return new_ckpt


def convert_mit(ckpt):
    """NVlabs SegFormer MiT -> mmseg (reference ``mit2mmseg.py:11-57``):
    per-stage renumbering, q+kv concat into in_proj, conv-ified FFN linears."""
    new_ckpt = OrderedDict()
    for k, v in ckpt.items():
        if k.startswith('head'):
            continue
        new_v = v
        if k.startswith('patch_embed'):
            stage_i = int(k.split('.')[0].replace('patch_embed', ''))
            new_k = k.replace(f'patch_embed{stage_i}', f'layers.{stage_i - 1}.0')
            if 'proj.' in new_k:
                new_k = new_k.replace('proj.', 'projection.')
        elif k.startswith('block'):
            stage_i = int(k.split('.')[0].replace('block', ''))
            new_k = k.replace(f'block{stage_i}', f'layers.{stage_i - 1}.1')
            if 'attn.q.' in new_k:
                new_v = np.concatenate([v, ckpt[k.replace('q.', 'kv.')]],
                                       axis=0)
                new_k = new_k.replace('q.', 'attn.in_proj_')
            elif 'attn.kv.' in new_k:
                continue
            elif 'attn.proj.' in new_k:
                new_k = new_k.replace('proj.', 'attn.out_proj.')
            elif 'mlp.' in new_k:
                new_k = new_k.replace('mlp.', 'ffn.layers.')
                if 'fc1.weight' in new_k or 'fc2.weight' in new_k:
                    new_v = v.reshape(*v.shape, 1, 1)
                new_k = new_k.replace('fc1.', '0.')
                new_k = new_k.replace('dwconv.dwconv.', '1.')
                new_k = new_k.replace('fc2.', '4.')
        elif k.startswith('norm'):
            stage_i = int(k.split('.')[0].replace('norm', ''))
            new_k = k.replace(f'norm{stage_i}', f'layers.{stage_i - 1}.2')
        else:
            new_k = k
        new_ckpt[new_k] = new_v
    return new_ckpt


def convert_stdc(ckpt, stdc_type):
    """Author STDC -> mmseg (reference ``stdc2mmseg.py:10-42``)."""
    if stdc_type == 'STDC1':
        stage_lst = ['0', '1', '2.0', '2.1', '3.0', '3.1', '4.0', '4.1']
    elif stdc_type == 'STDC2':
        stage_lst = ['0', '1', '2.0', '2.1', '2.2', '2.3', '3.0', '3.1',
                     '3.2', '3.3', '3.4', '4.0', '4.1', '4.2']
    else:
        raise ValueError(f'unknown STDC type {stdc_type!r}')
    new_ckpt = OrderedDict()
    for ori_k, v in ckpt.items():
        k = ori_k
        keep = False
        if 'cp.' in k:
            k = k.replace('cp.', '')
        if 'features.' in k:
            num_layer = int(k.split('.')[1])
            k = k.replace(f'features.{num_layer}.',
                          f'stages.{stage_lst[num_layer]}.')
            keep = True
        if 'conv_list' in k:
            k = k.replace('conv_list', 'layers')
            keep = True
        if 'avd_layer.0' in k:
            k = k.replace('avd_layer.0', 'downsample.conv')
            keep = True
        elif 'avd_layer.1' in k:
            k = k.replace('avd_layer.1', 'downsample.bn')
            keep = True
        if keep:
            new_ckpt[k] = v
    return new_ckpt


def convert_twins(ckpt, model):
    """Twins PCPVT/SVT -> mmseg (reference ``twins2mmseg.py:11-59``)."""
    new_ckpt = OrderedDict()
    for k, v in ckpt.items():
        if k.startswith('head') or 'attn.kv.' in k:
            continue
        new_v = v
        if k.startswith('patch_embeds'):
            new_k = k.replace('proj.', 'projection.') if 'proj.' in k else k
        elif k.startswith('blocks'):
            if 'attn.q.' in k:
                new_k = k.replace('q.', 'attn.in_proj_')
                new_v = np.concatenate(
                    [v, ckpt[k.replace('attn.q.', 'attn.kv.')]], axis=0)
            elif 'mlp.fc1' in k:
                new_k = k.replace('mlp.fc1', 'ffn.layers.0.0')
            elif 'mlp.fc2' in k:
                new_k = k.replace('mlp.fc2', 'ffn.layers.1')
            elif 'attn.proj.' in k:
                if model == 'pcpvt':
                    new_k = k.replace('proj.', 'attn.out_proj.')
                else:  # svt: only odd (GSA) blocks use the wrapped MHA
                    new_k = (k.replace('proj.', 'attn.out_proj.')
                             if int(k.split('.')[2]) % 2 == 1 else k)
            else:
                new_k = k
            new_k = new_k.replace('blocks.', 'layers.')
        elif k.startswith('pos_block'):
            new_k = k.replace('pos_block', 'position_encodings')
            if 'proj.0.' in new_k:
                new_k = new_k.replace('proj.0.', 'proj.')
        else:
            new_k = k
        new_ckpt[new_k] = new_v
    return new_ckpt


def _convert_clip_vitlayer(paras):
    """One in-tower CLIP resblock (reference ``clip2mmseg.py:11-26``)."""
    if paras[0] == 'ln_1':
        return '.'.join(['ln1'] + paras[1:])
    if paras[0] == 'attn':
        return '.'.join(['attn.attn'] + paras[1:])
    if paras[0] == 'ln_2':
        return '.'.join(['ln2'] + paras[1:])
    if paras[0] == 'mlp':
        if paras[1] == 'c_fc':
            return '.'.join(['ffn.layers.0.0'] + paras[-1:])
        return '.'.join(['ffn.layers.1'] + paras[-1:])
    raise KeyError(f'unmappable CLIP vit layer params: {paras}')


def _convert_clip_translayer(paras):
    """One rec-head/text transformer resblock (``clip2mmseg.py:29-46``)."""
    if paras[0] == 'attn':
        return '.'.join(['attentions.0.attn'] + paras[1:])
    if paras[0] == 'ln_1':
        return '.'.join(['norms.0'] + paras[1:])
    if paras[0] == 'ln_2':
        return '.'.join(['norms.1'] + paras[1:])
    if paras[0] == 'mlp':
        if paras[1] == 'c_fc':
            return '.'.join(['ffns.0.layers.0.0'] + paras[2:])
        if paras[1] == 'c_proj':
            return '.'.join(['ffns.0.layers.1'] + paras[2:])
    raise KeyError(f'unmappable CLIP transformer params: {paras}')


def convert_clip(ckpt, visual_split):
    """OpenAI CLIP -> SAN-mmseg layout (reference ``clip2mmseg.py:49-125``):
    the visual tower's first ``visual_split`` resblocks become the SAN image
    encoder, the rest the rec-with-attnbias head; text tower maps whole."""
    new_ckpt = OrderedDict()
    for k, v in ckpt.items():
        kl = k.split('.')
        if kl[0] == 'visual':
            if kl[1] == 'class_embedding':
                new_name = 'image_encoder.cls_token'
            elif kl[1] == 'positional_embedding':
                new_name = 'image_encoder.pos_embed'
            elif kl[1] == 'conv1':
                new_name = f'image_encoder.patch_embed.projection.{kl[2]}'
            elif kl[1] == 'ln_pre':
                new_name = f'image_encoder.{kl[1]}.{kl[2]}'
            elif kl[1] == 'transformer':
                layer_index = int(kl[3])
                paras = kl[4:]
                if layer_index < visual_split:
                    new_name = '.'.join(['image_encoder.layers',
                                         str(layer_index),
                                         _convert_clip_vitlayer(paras)])
                else:
                    new_name = '.'.join(
                        ['decode_head.rec_with_attnbias.layers',
                         str(layer_index - visual_split),
                         _convert_clip_translayer(paras)])
            elif kl[1] == 'proj':
                new_name = 'decode_head.rec_with_attnbias.proj.weight'
            elif kl[1] == 'ln_post':
                new_name = k.replace('visual',
                                     'decode_head.rec_with_attnbias')
            else:
                continue
        elif kl[0] == 'transformer':
            new_name = '.'.join(['text_encoder.transformer', kl[2],
                                 _convert_clip_translayer(kl[3:])])
        elif kl[0] in ('positional_embedding', 'text_projection', 'bg_embed',
                       'attn_mask', 'logit_scale', 'token_embedding',
                       'ln_final'):
            new_name = 'text_encoder.' + k
        else:
            continue
        new_ckpt[new_name] = v
    return _reshape_san_tensors(new_ckpt)


def _reshape_san_tensors(ckpt):
    """Shared tensor munging (reference ``clip2mmseg.py:115-125`` /
    ``san2mmseg.py:182-192``): cls token -> (1,1,C), pos embed -> (1,L,C),
    rec proj transposed to a linear weight."""
    if 'image_encoder.cls_token' in ckpt:
        ckpt['image_encoder.cls_token'] = \
            ckpt['image_encoder.cls_token'][None, None]
    if 'image_encoder.pos_embed' in ckpt:
        ckpt['image_encoder.pos_embed'] = ckpt['image_encoder.pos_embed'][None]
    pk = 'decode_head.rec_with_attnbias.proj.weight'
    if pk in ckpt:
        ckpt[pk] = ckpt[pk].T
    return ckpt


def convert_san(ckpt):
    """Official SAN -> mmseg (reference ``san2mmseg.py:11-192``)."""
    new_ckpt = OrderedDict()
    for k, v in ckpt.items():
        kl = k.split('.')
        if kl[0] == 'clip_visual_extractor':
            if kl[1] == 'class_embedding':
                new_name = 'image_encoder.cls_token'
            elif kl[1] == 'positional_embedding':
                new_name = 'image_encoder.pos_embed'
            elif kl[1] == 'conv1':
                new_name = f'image_encoder.patch_embed.projection.{kl[2]}'
            elif kl[1] == 'ln_pre':
                new_name = f'image_encoder.{kl[1]}.{kl[2]}'
            elif kl[1] == 'resblocks':
                new_name = '.'.join(['image_encoder.layers', kl[2],
                                     _convert_clip_vitlayer(kl[3:])])
            else:
                continue
        elif kl[0] == 'side_adapter_network':
            base = 'decode_head.side_adapter_network'
            if kl[1] == 'vit_model':
                if kl[2] == 'blocks':
                    paras = kl[4:]
                    if paras[0] == 'norm1':
                        sub = '.'.join(['ln1'] + kl[5:])
                    elif paras[0] == 'attn':
                        sub = '.'.join(kl[4:]) \
                            .replace('attn.qkv.', 'attn.attn.in_proj_') \
                            .replace('attn.proj', 'attn.attn.out_proj')
                    elif paras[0] == 'norm2':
                        sub = '.'.join(['ln2'] + kl[5:])
                    elif paras[0] == 'mlp':
                        sub = '.'.join(['ffn'] + kl[5:]) \
                            .replace('fc1', 'layers.0.0') \
                            .replace('fc2', 'layers.1')
                    else:
                        continue
                    new_name = f'{base}.encode_layers.{kl[3]}.{sub}'
                elif kl[2] == 'pos_embed':
                    new_name = f'{base}.pos_embed'
                elif kl[2] == 'patch_embed':
                    new_name = f'{base}.patch_embed.projection.{kl[4]}'
                else:
                    continue
            elif kl[1] in ('query_embed', 'query_pos_embed'):
                new_name = f'{base}.{kl[1]}'
            elif kl[1] == 'fusion_layers':
                sub = '.'.join(kl[3:]).replace('input_proj.0', '0') \
                                      .replace('input_proj.1', '1.conv')
                new_name = f'{base}.conv_clips.{kl[2][-1]}.{sub}'
            elif kl[1] == 'mask_decoder':
                new_name = 'decode_head.' + k
            else:
                continue
        elif kl[0] == 'clip_rec_head':
            base = 'decode_head.rec_with_attnbias'
            if kl[1] == 'proj':
                new_name = f'{base}.proj.weight'
            elif kl[1] == 'ln_post':
                new_name = f'{base}.ln_post.{kl[2]}'
            elif kl[1] == 'resblocks':
                new_name = '.'.join([f'{base}.layers', kl[2],
                                     _convert_clip_translayer(kl[3:])])
            else:
                continue
        elif kl[0] == 'ov_classifier':
            if kl[1] == 'transformer':
                new_name = '.'.join(['text_encoder.transformer', kl[3],
                                     _convert_clip_translayer(kl[4:])])
            elif kl[1] in ('positional_embedding', 'text_projection',
                           'bg_embed', 'attn_mask', 'logit_scale',
                           'token_embedding', 'ln_final'):
                new_name = k.replace('ov_classifier', 'text_encoder')
            else:
                continue
        elif kl[0] == 'criterion':
            new_name = k
        else:
            continue
        new_ckpt[new_name] = v
    return _reshape_san_tensors(new_ckpt)


def convert_vitjax(jax_weights, num_layer=12):
    """google/vision_transformer JAX npz -> mmseg torch naming
    (reference ``vitjax2mmseg.py:10-96``)."""
    out = {}
    out['patch_embed.projection.weight'] = np.transpose(
        jax_weights['embedding/kernel'], (3, 2, 0, 1))
    out['patch_embed.projection.bias'] = jax_weights['embedding/bias']
    out['pos_embed'] = jax_weights['Transformer/posembed_input/pos_embedding']
    out['cls_token'] = jax_weights['cls']
    out['ln1.weight'] = jax_weights['Transformer/encoder_norm/scale']
    out['ln1.bias'] = jax_weights['Transformer/encoder_norm/bias']
    for i in range(num_layer):
        jb = f'Transformer/encoderblock_{i}'
        tb = f'layers.{i}'
        msa = f'{jb}/MultiHeadDotProductAttention_1'
        out[f'{tb}.ln1.weight'] = jax_weights[f'{jb}/LayerNorm_0/scale']
        out[f'{tb}.ln1.bias'] = jax_weights[f'{jb}/LayerNorm_0/bias']
        qkv_w = np.stack([jax_weights[f'{msa}/{n}/kernel']
                          for n in ('query', 'key', 'value')], axis=1)
        out[f'{tb}.attn.attn.in_proj_weight'] = \
            qkv_w.reshape(qkv_w.shape[0], -1)
        qkv_b = np.stack([jax_weights[f'{msa}/{n}/bias']
                          for n in ('query', 'key', 'value')], axis=0)
        out[f'{tb}.attn.attn.in_proj_bias'] = qkv_b.reshape(-1)
        ow = jax_weights[f'{msa}/out/kernel']
        out[f'{tb}.attn.attn.out_proj.weight'] = \
            ow.reshape(-1, ow.shape[-1])
        out[f'{tb}.attn.attn.out_proj.bias'] = jax_weights[f'{msa}/out/bias']
        out[f'{tb}.ln2.weight'] = jax_weights[f'{jb}/LayerNorm_2/scale']
        out[f'{tb}.ln2.bias'] = jax_weights[f'{jb}/LayerNorm_2/bias']
        out[f'{tb}.ffn.layers.0.0.weight'] = \
            jax_weights[f'{jb}/MlpBlock_3/Dense_0/kernel']
        out[f'{tb}.ffn.layers.0.0.bias'] = \
            jax_weights[f'{jb}/MlpBlock_3/Dense_0/bias']
        out[f'{tb}.ffn.layers.1.weight'] = \
            jax_weights[f'{jb}/MlpBlock_3/Dense_1/kernel']
        out[f'{tb}.ffn.layers.1.bias'] = \
            jax_weights[f'{jb}/MlpBlock_3/Dense_1/bias']
    # jax kernels are (in, out): transpose every non-conv, non-norm weight
    for k, v in out.items():
        if 'weight' in k and 'patch_embed' not in k and 'ln' not in k:
            out[k] = v.T
    return out


def load_official_state_dict(src):
    """Load a torch checkpoint and pull out the state dict (reference CLIs
    accept plain/timm 'state_dict'/deit 'model' containers and torchscript
    archives)."""
    import torch
    try:
        ckpt = torch.load(src, map_location='cpu', weights_only=False)
    except RuntimeError:
        ckpt = torch.jit.load(src, map_location='cpu')
    if hasattr(ckpt, 'state_dict') and not isinstance(ckpt, dict):
        ckpt = ckpt.state_dict()
    if isinstance(ckpt, dict) and 'state_dict' in ckpt:
        ckpt = ckpt['state_dict']
    elif isinstance(ckpt, dict) and 'model' in ckpt:
        ckpt = ckpt['model']
    return {k: np.asarray(v.detach().cpu().numpy()) if hasattr(v, 'detach')
            else np.asarray(v) for k, v in ckpt.items()}


def save_mmseg_pth(state, dst):
    import os

    import torch
    d = os.path.dirname(os.path.abspath(dst))
    os.makedirs(d, exist_ok=True)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in state.items()}, dst)
    print(f'wrote {dst} ({len(state)} tensors); feed it to mmseg2jax.py '
          'to produce orbax params')
