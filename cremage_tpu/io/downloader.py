"""Model downloader.

Behavior contract: reference `utils/model_downloader.py:16
download_model_if_not_exist` (HF-hub cached fetch) gated by the
`enable_hf_internet_connection` preference (`cremage_main.py:25-28`
exports ENABLE_HF_INTERNET_CONNECTION)."""
from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)


def internet_enabled() -> bool:
    return os.environ.get("ENABLE_HF_INTERNET_CONNECTION", "true").lower() \
        not in ("0", "false", "no")


def download_model_if_not_exist(
    local_path: str,
    repo_id: str,
    filename: str,
    revision: Optional[str] = None,
) -> str:
    """Return local_path, downloading from HF hub if missing & allowed."""
    if os.path.exists(local_path):
        return local_path
    if not internet_enabled():
        raise FileNotFoundError(
            f"{local_path} missing and HF internet access is disabled "
            f"(enable_hf_internet_connection=false)"
        )
    from huggingface_hub import hf_hub_download

    logger.info("downloading %s/%s", repo_id, filename)
    got = hf_hub_download(repo_id=repo_id, filename=filename,
                          revision=revision)
    os.makedirs(os.path.dirname(os.path.abspath(local_path)), exist_ok=True)
    if os.path.abspath(got) != os.path.abspath(local_path):
        import shutil

        shutil.copyfile(got, local_path)
    return local_path
