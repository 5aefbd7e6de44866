# Extension config: names the project's own backbone. Consumers must import
# the project package first (or run tools with PYTHONPATH including repo root
# and `import projects.example_project`).
_base_ = ['../../../configs/_base_/default_runtime.py',
          '../../../configs/_base_/schedules/schedule_80k.py']
model = dict(
    type='EncoderDecoder',
    backbone=dict(type='DummyResNet', depth=18, base_channels=16,
                  stem_channels=16),
    decode_head=dict(type='FCNHead', in_channels=128, in_index=-1,
                     channels=32, num_convs=1, concat_input=False,
                     num_classes=19))
