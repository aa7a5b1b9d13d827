"""URL weight caching (reference ``fcos_core/utils/model_zoo.py:10-64``).

``cache_url`` resolves a weights URL to a local cache path:
``$SCAN_TPU_CACHE_DIR`` > ``$TORCH_MODEL_ZOO`` > ``$TORCH_HOME/models`` >
``~/.torch/models``. If the file is already cached it is returned without
touching the network; otherwise it is downloaded on the main process only
(other processes wait at the barrier, mirroring the reference's
is_main_process/synchronize pair). The filename convention
``name-<sha256prefix>.ext`` is verified when a hash prefix >= 6 hex chars
is present (shorter ones are Detectron-style ids, skipped — reference
model_zoo.py:55-60); Detectron's all-identical ``model_final.pkl`` names
are disambiguated by flattening the URL path.
"""

import hashlib
import os
import re
import sys

_HASH_RE = re.compile(r"-([a-f0-9]*)\.")


def default_cache_dir() -> str:
    d = os.environ.get("SCAN_TPU_CACHE_DIR")
    if d:
        return d
    d = os.environ.get("TORCH_MODEL_ZOO")
    if d:
        return d
    torch_home = os.path.expanduser(os.environ.get("TORCH_HOME", "~/.torch"))
    return os.path.join(torch_home, "models")


def url_to_filename(url: str) -> str:
    from urllib.parse import urlparse

    parts = urlparse(url)
    if parts.fragment:
        return parts.fragment
    filename = os.path.basename(parts.path)
    if filename == "model_final.pkl":
        # Detectron pre-trained files all share this name; use the full
        # path as the cache key (reference model_zoo.py:46-50)
        filename = parts.path.replace("/", "_")
    return filename


def cache_url(url: str, model_dir: str = None, progress: bool = True) -> str:
    from ..parallel.mesh import is_main_process, synchronize

    model_dir = model_dir or default_cache_dir()
    os.makedirs(model_dir, exist_ok=True)
    cached_file = os.path.join(model_dir, url_to_filename(url))
    if not os.path.exists(cached_file) and is_main_process():
        sys.stderr.write(f'Downloading: "{url}" to {cached_file}\n')
        hash_prefix = None
        m = _HASH_RE.search(os.path.basename(cached_file))
        if m and len(m.group(1)) >= 6:
            hash_prefix = m.group(1)
        _download(url, cached_file, hash_prefix)
    synchronize()
    return cached_file


def _download(url: str, dst: str, hash_prefix=None):
    import shutil
    import tempfile
    from urllib.request import urlopen

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(dst))
    try:
        sha = hashlib.sha256()
        with os.fdopen(fd, "wb") as out, urlopen(url) as resp:
            while True:
                chunk = resp.read(1 << 20)
                if not chunk:
                    break
                sha.update(chunk)
                out.write(chunk)
        if hash_prefix and not sha.hexdigest().startswith(hash_prefix):
            raise RuntimeError(
                f"invalid hash for {url}: got {sha.hexdigest()[:16]}..., "
                f"expected prefix {hash_prefix}"
            )
        shutil.move(tmp, dst)
    except BaseException:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise


def resolve_weight_uri(f: str, paths_catalog=None) -> str:
    """catalog:// and http(s):// -> local cached path (reference
    ``utils/checkpoint.py:117-139`` _load_file resolution order)."""
    if f.startswith("catalog://"):
        if paths_catalog is None:
            from ..config import paths_catalog as paths_catalog_mod

            paths_catalog = paths_catalog_mod
        f = paths_catalog.ModelCatalog.get(f[len("catalog://"):])
    if f.startswith("http://") or f.startswith("https://"):
        f = cache_url(f)
    return f
