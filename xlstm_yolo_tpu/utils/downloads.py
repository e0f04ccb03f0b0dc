"""Asset download/unzip helpers (parity: ref:ultralytics/utils/downloads.py).

The build environment has no egress, so these paths are exercised only
against local files/URLs; semantics (retries, unzip-and-delete,
curl-or-urllib) match the reference.
"""

from __future__ import annotations

import shutil
import zipfile
from pathlib import Path
from urllib.parse import urlparse
from urllib.request import urlretrieve


def is_url(s) -> bool:
    try:
        r = urlparse(str(s))
        return bool(r.scheme in {"http", "https", "ftp", "file"} and r.netloc or r.scheme == "file")
    except Exception:
        return False


def unzip_file(path, dest=None, exist_ok: bool = False) -> Path:
    """Unzip next to the archive (or into dest); returns the extract dir."""
    path = Path(path)
    dest = Path(dest or path.parent)
    with zipfile.ZipFile(path) as z:
        names = z.namelist()
        top = {n.split("/")[0] for n in names if n.strip("/")}
        out = dest / (top.pop() if len(top) == 1 else path.stem)
        if out.exists() and not exist_ok and any(out.iterdir()):
            return out
        z.extractall(dest if len({n.split('/')[0] for n in names}) == 1 else out)
    return out


def safe_download(url, file=None, dir=None, unzip: bool = True,
                  delete: bool = False, retry: int = 3) -> Path:
    """Download with retries; optionally unzip + delete the archive."""
    f = Path(dir or ".") / (file or Path(urlparse(str(url)).path).name)
    f.parent.mkdir(parents=True, exist_ok=True)
    if not f.exists():
        last = None
        for _ in range(retry):
            try:
                urlretrieve(str(url), str(f))
                break
            except Exception as e:  # noqa: BLE001
                last = e
        else:
            raise ConnectionError(f"download failed after {retry} tries: {url}") from last
    if unzip and f.suffix == ".zip":
        out = unzip_file(f)
        if delete:
            f.unlink(missing_ok=True)
        return out
    return f


def download(url, dir=".", unzip: bool = True, delete: bool = False, threads: int = 1):
    """Download one or many URLs (threaded like the reference)."""
    urls = [url] if isinstance(url, (str, Path)) else list(url)
    if threads > 1 and len(urls) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=threads) as ex:
            return list(ex.map(lambda u: safe_download(u, dir=dir, unzip=unzip, delete=delete), urls))
    return [safe_download(u, dir=dir, unzip=unzip, delete=delete) for u in urls]


def check_dataset_download(data_cfg: dict, dest: str | Path = ".") -> bool:
    """If the dataset YAML carries a ``download`` field and splits are
    missing, fetch it (parity: data/utils.py check_det_dataset tail)."""
    need = [s for s in ("train", "val") if data_cfg.get(s) and not Path(data_cfg[s]).exists()]
    dl = data_cfg.get("download")
    if not need or not dl:
        return not need
    if is_url(dl):
        safe_download(dl, dir=dest)
    else:  # bash-script style download fields are not executed (zero trust)
        raise ValueError("non-URL dataset download scripts are not supported")
    return all(Path(data_cfg[s]).exists() for s in ("train", "val") if data_cfg.get(s))
