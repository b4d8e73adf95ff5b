"""Typed-config tests: channel-count rule, reference-YAML schema, and the
leg_output_width consistency validation (reference network.yml:77 declares a
value that is really a function of the conv stack)."""

import pytest

from overlapnet_tpu.core.config import ChannelConfig, config_from_dict


def test_channel_count_rule():
    # reference training.py:162-176
    assert ChannelConfig().num_channels == 4  # depth + normals
    assert ChannelConfig(use_class_probabilities=True).num_channels == 24
    assert (
        ChannelConfig(
            use_class_probabilities=True, use_class_probabilities_pca=True
        ).num_channels
        == 7
    )
    assert ChannelConfig(use_intensity=True).num_channels == 5


def test_leg_output_width_validated_against_conv_stack():
    ok = {"model": {"inputShape": [64, 900, 4], "leg_output_width": 360}}
    assert config_from_dict(ok).model.input_width == 900

    bad = {"model": {"inputShape": [64, 900, 4], "leg_output_width": 90}}
    with pytest.raises(ValueError, match="leg_output_width"):
        config_from_dict(bad)


def test_seq_lists_space_separated():
    # reference network.yml:33-39 uses space-separated strings
    cfg = config_from_dict({"training_seqs": "03 04 05", "testing_seqs": ["07"]})
    assert cfg.data.training_seqs == ["03", "04", "05"]
    assert cfg.data.testing_seqs == ["07"]
