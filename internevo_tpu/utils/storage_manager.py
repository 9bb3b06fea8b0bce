"""Storage manager: URI-prefixed backends with async upload.

Parity: reference ``internlm/utils/storage_manager.py`` — ``StorageManager``
(:984) with ``local:``, ``boto3:``, ``volc:``, ``oss2:`` backends, async upload
via tmp-staging + thread pool, and a ``wait()`` barrier before the next save.
This environment is zero-egress, so only the local backend is functional; the
cloud backends raise with a clear message but keep the URI-routing surface.
"""

from __future__ import annotations

import concurrent.futures
import os
import shutil
from typing import Optional

from .logger import get_logger

logger = get_logger(__name__)


class LocalClient:
    @staticmethod
    def load(path: str):
        import pickle

        with open(path, "rb") as f:
            return pickle.load(f)

    @staticmethod
    def save(path: str, obj):
        import pickle

        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(obj, f)

    @staticmethod
    def assert_fp_exists(path: str):
        assert os.path.exists(path), path

    @staticmethod
    def get_fns(path: str):
        return os.listdir(path) if os.path.isdir(path) else []

    @staticmethod
    def delete_obj(path: str):
        if os.path.isdir(path):
            shutil.rmtree(path)
        elif os.path.exists(path):
            os.remove(path)


def _unsupported(backend: str):
    raise NotImplementedError(
        f"storage backend '{backend}' requires network credentials not available "
        f"in this environment; use 'local:' paths"
    )


class StorageManager:
    """Routes URI-prefixed paths (``local:/path``, ``boto3:s3://..`` etc.) and
    runs async uploads on a small thread pool."""

    BACKENDS = ("local", "boto3", "volc", "oss2")

    def __init__(self, enable_save: bool = True, async_upload: bool = True,
                 async_upload_tmp_folder: Optional[str] = None):
        self.enable_save = enable_save
        self.async_upload = async_upload
        self.tmp_folder = async_upload_tmp_folder
        self._pool = concurrent.futures.ThreadPoolExecutor(max_workers=4) if async_upload else None
        self._futures: list[concurrent.futures.Future] = []

    @staticmethod
    def _parse(path: str) -> tuple[str, str]:
        if ":" in path and path.split(":", 1)[0] in StorageManager.BACKENDS:
            backend, rest = path.split(":", 1)
            return backend, rest
        return "local", path

    def save(self, path: str, obj, async_upload: Optional[bool] = None):
        backend, fp = self._parse(path)
        if backend != "local":
            _unsupported(backend)
        use_async = self.async_upload if async_upload is None else async_upload
        if use_async and self._pool is not None:
            self._futures.append(self._pool.submit(LocalClient.save, fp, obj))
        else:
            LocalClient.save(fp, obj)

    def load(self, path: str):
        backend, fp = self._parse(path)
        if backend != "local":
            _unsupported(backend)
        return LocalClient.load(fp)

    def get_fns(self, path: str):
        backend, fp = self._parse(path)
        if backend != "local":
            _unsupported(backend)
        return LocalClient.get_fns(fp)

    def delete_obj(self, path: str):
        backend, fp = self._parse(path)
        if backend != "local":
            _unsupported(backend)
        LocalClient.delete_obj(fp)

    def wait(self):
        """Barrier: block until all queued async uploads finish (ref :1136+)."""
        for fut in self._futures:
            fut.result()
        self._futures.clear()


_storage_manager: Optional[StorageManager] = None


def init_storage_manager(enable_save: bool = True, async_upload: bool = True,
                         async_upload_tmp_folder: Optional[str] = None) -> StorageManager:
    global _storage_manager
    _storage_manager = StorageManager(enable_save, async_upload, async_upload_tmp_folder)
    return _storage_manager


def get_storage_manager() -> StorageManager:
    global _storage_manager
    if _storage_manager is None:
        _storage_manager = StorageManager()
    return _storage_manager


def llm_save(path: str, obj, **kwargs):
    get_storage_manager().save(path, obj, **kwargs)


def llm_load(path: str, **kwargs):
    return get_storage_manager().load(path)
