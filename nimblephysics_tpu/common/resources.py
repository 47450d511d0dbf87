"""Resource retrieval (reference: dart/common ResourceRetriever family +
dart/utils/*Retriever*): resolve file://, package://, and bare paths."""

from __future__ import annotations

import os
from typing import Dict, List, Optional


class LocalResourceRetriever:
    """file:// and plain filesystem paths."""

    def exists(self, uri: str) -> bool:
        return os.path.exists(self._path(uri))

    def retrieve(self, uri: str) -> bytes:
        with open(self._path(uri), "rb") as f:
            return f.read()

    def get_file_path(self, uri: str) -> str:
        return self._path(uri)

    @staticmethod
    def _path(uri: str) -> str:
        if uri.startswith("file://"):
            return uri[len("file://"):]
        return uri


class PackageResourceRetriever:
    """package://name/... -> registered package directories (reference:
    utils::PackageResourceRetriever used by the URDF loader)."""

    def __init__(self, local: Optional[LocalResourceRetriever] = None):
        self._packages: Dict[str, List[str]] = {}
        self._local = local or LocalResourceRetriever()

    def add_package_directory(self, package: str, path: str) -> None:
        self._packages.setdefault(package, []).append(path)

    def _resolve(self, uri: str) -> Optional[str]:
        if not uri.startswith("package://"):
            return None
        rest = uri[len("package://"):]
        pkg, _, rel = rest.partition("/")
        for base in self._packages.get(pkg, []):
            cand = os.path.join(base, rel)
            if os.path.exists(cand):
                return cand
        return None

    def exists(self, uri: str) -> bool:
        return self._resolve(uri) is not None

    def retrieve(self, uri: str) -> bytes:
        p = self._resolve(uri)
        if p is None:
            raise FileNotFoundError(uri)
        with open(p, "rb") as f:
            return f.read()

    def get_file_path(self, uri: str) -> str:
        p = self._resolve(uri)
        if p is None:
            raise FileNotFoundError(uri)
        return p


class CompositeResourceRetriever:
    """Chain of retrievers, first hit wins (reference:
    utils::CompositeResourceRetriever)."""

    def __init__(self):
        self._retrievers: List = []

    def add_default_retriever(self, r) -> None:
        self._retrievers.append(r)

    def exists(self, uri: str) -> bool:
        return any(r.exists(uri) for r in self._retrievers)

    def retrieve(self, uri: str) -> bytes:
        for r in self._retrievers:
            if r.exists(uri):
                return r.retrieve(uri)
        raise FileNotFoundError(uri)

    def get_file_path(self, uri: str) -> str:
        for r in self._retrievers:
            if r.exists(uri):
                return r.get_file_path(uri)
        raise FileNotFoundError(uri)
