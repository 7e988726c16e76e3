"""HUB integration surface (parity: reference ultralytics/hub/).

This build environment is zero-egress, so cloud sync is structurally
unavailable; the API surface exists and raises informative errors rather than
failing obscurely mid-train (reference hub: auth, training-session sync,
model upload/export).
"""

from yolo_ad_refine_tpu.utils import LOGGER

HUB_UNAVAILABLE = (
    "HUB features require network access, which this deployment disables. "
    "Checkpoints are fully local: see runs/<name>/weights/."
)


def login(api_key: str | None = None):
    raise ConnectionError(HUB_UNAVAILABLE)


def logout():
    LOGGER.info("hub: nothing to log out from (offline deployment)")


def export_model(model_id: str = "", format: str = "torchscript"):  # noqa: A002
    raise ConnectionError(HUB_UNAVAILABLE)


def check_dataset(path: str = "", task: str = "detect"):
    """Local-only dataset validation (the reference uploads to HUB after)."""
    from yolo_ad_refine_tpu.data import check_det_dataset

    info = check_det_dataset(path)
    LOGGER.info(f"dataset ok: nc={info['nc']} names={list(info['names'].values())[:5]}...")
    return info
