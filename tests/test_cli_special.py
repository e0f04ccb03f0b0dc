"""Special CLI words (parity: ref:cfg/__init__.py:555-690 handlers)."""

from xlstm_yolo_tpu.cfg import entrypoint


def test_version_and_cfg_and_checks(capsys):
    v = entrypoint(["version"])
    assert "0.1.0" in v
    cfg = entrypoint(["cfg"])
    assert "imgsz" in cfg and "lr0" in cfg
    info = entrypoint(["checks"])
    assert info["backend"] in ("cpu", "tpu") and info["devices"]


def test_solutions_listing_and_construct(tmp_path):
    names = entrypoint(["solutions"])
    assert {"count", "heatmap", "speed", "workout"} <= set(names)
    inst = entrypoint(["solutions", "region"])
    from xlstm_yolo_tpu.solutions import RegionCounter

    assert isinstance(inst, RegionCounter)


def test_settings_roundtrip(tmp_path):
    # isolated manager (the CLI word mutates the USER settings file —
    # exercise the same class against a tmp path instead)
    from xlstm_yolo_tpu.utils.logger import SettingsManager

    sm = SettingsManager(path=tmp_path / "settings.json")
    sm.update(sync=True)
    sm.save()
    sm2 = SettingsManager(path=tmp_path / "settings.json")
    assert sm2["sync"] is True
    sm2.reset()
    assert SettingsManager(path=tmp_path / "settings.json")["sync"] is False
    # CLI word: display-only call returns the mapping
    out = entrypoint(["settings"])
    assert "sync" in out and "datasets_dir" in out
