"""Reference-recipe presets (train.py / train_pixellink.py two-pass
argparse): the preset installs the published flag set, explicit flags
still win."""

import train
import train_pixellink


def test_gssdpp_recipe_defaults():
    a = train.parse_args(["--reference_recipe", "gssd++"])
    assert a.use_self_attention and a.use_self_attention_base
    assert a.num_dcn_layers == 1 and a.groups_dcn == 4 and a.dcn_cat_sab
    assert a.modify_dcn_lr
    assert a.batch_size == 32 and a.max_iter == 60000
    assert a.stepvalues == [30000, 50000]
    assert a.use_07_metric is False and a.confidence_threshold == 0.2


def test_explicit_flags_override_recipe():
    a = train.parse_args(
        ["--reference_recipe", "gssd++", "--batch_size", "4",
         "--max_iter", "100"])
    assert a.batch_size == 4 and a.max_iter == 100
    assert a.num_dcn_layers == 1  # preset still applies elsewhere


def test_pixellink_recipes():
    a = train_pixellink.parse_args(["--reference_recipe", "pixellink++"])
    assert a.vgg_groups == 4 and a.use_fuseconv
    assert a.use_self_attention and a.num_dcn_layers == 1
    assert a.stepvalues == []  # reference: no LR decay (sentinel
    # 9999999999999 overflows the int32 schedule counter; [] = no decay)
    assert a.use_07_metric is False
    b = train_pixellink.parse_args(["--reference_recipe", "pixellink"])
    assert b.vgg_groups == 1 and not b.use_fuseconv
    assert b.num_dcn_layers == 0


def test_pixellink_default_matches_reference_trainer():
    a = train_pixellink.parse_args([])
    assert a.stepvalues == []
    assert a.use_07_metric is False
    assert a.lr == 5e-4 and a.batch_size == 16
