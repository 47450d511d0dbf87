"""Signals, names, subjects, timers, aspects.

Reference parity: dart/common — Signal (Signal.hpp), NameManager
(NameManager.hpp: unique-name issuance), Subject (Subject.hpp: observer
lifetime notification), Timer, Uri, Aspect/Composite (Aspect.hpp /
Composite.hpp: attach typed state to objects at runtime).
"""

from __future__ import annotations

import time
import urllib.parse
from typing import Any, Callable, Dict, List, Optional, Type


class Signal:
    """Multicast callback (reference: common::Signal)."""

    def __init__(self):
        self._slots: List[Callable] = []

    def connect(self, fn: Callable) -> Callable:
        self._slots.append(fn)
        return fn

    def disconnect(self, fn: Callable) -> None:
        if fn in self._slots:
            self._slots.remove(fn)

    def raise_signal(self, *args, **kw) -> None:
        for fn in list(self._slots):
            fn(*args, **kw)

    __call__ = raise_signal

    @property
    def num_connections(self) -> int:
        return len(self._slots)


class NameManager:
    """Issue unique names (reference: common::NameManager)."""

    def __init__(self, manager_name: str = "", default_name: str = "object"):
        self.manager_name = manager_name
        self.default_name = default_name
        self._names: Dict[str, Any] = {}

    def issue_new_name(self, name: str) -> str:
        if name not in self._names:
            return name
        k = 1
        while f"{name}({k})" in self._names:
            k += 1
        return f"{name}({k})"

    def add_name(self, name: str, obj: Any) -> str:
        name = name or self.default_name
        unique = self.issue_new_name(name)
        self._names[unique] = obj
        return unique

    def remove_name(self, name: str) -> bool:
        return self._names.pop(name, None) is not None

    def get(self, name: str) -> Any:
        return self._names.get(name)

    def has_name(self, name: str) -> bool:
        return name in self._names

    def __len__(self):
        return len(self._names)


class Subject:
    """Observer-lifetime notification (reference: common::Subject)."""

    def __init__(self):
        self._observers: List[Callable[["Subject"], None]] = []

    def add_observer(self, on_destroy: Callable[["Subject"], None]) -> None:
        self._observers.append(on_destroy)

    def send_destruction_notification(self) -> None:
        for cb in list(self._observers):
            cb(self)
        self._observers.clear()


class Timer:
    """Start/stop wall timer (reference: common::Timer)."""

    def __init__(self, name: str = "timer"):
        self.name = name
        self._start: Optional[float] = None
        self.elapsed: float = 0.0

    def start(self) -> None:
        self._start = time.perf_counter()

    def stop(self) -> float:
        assert self._start is not None
        self.elapsed += time.perf_counter() - self._start
        self._start = None
        return self.elapsed


class Uri:
    """URI parse/compose (reference: common::Uri)."""

    def __init__(self, uri: str = ""):
        p = urllib.parse.urlparse(uri)
        self.scheme = p.scheme
        self.authority = p.netloc
        self.path = p.path
        self.query = p.query
        self.fragment = p.fragment

    @staticmethod
    def from_path(path: str) -> "Uri":
        return Uri("file://" + path)

    def to_string(self) -> str:
        return urllib.parse.urlunparse(
            (self.scheme, self.authority, self.path, "", self.query,
             self.fragment)
        )

    def get_filesystem_path(self) -> str:
        return self.path


class Aspect:
    """Typed runtime extension (reference: common::Aspect)."""

    def set_composite(self, comp: "Composite") -> None:
        self.composite = comp


class Composite:
    """Aspect container (reference: common::Composite)."""

    def __init__(self):
        self._aspects: Dict[Type, Aspect] = {}

    def create_aspect(self, cls: Type, *args, **kw) -> Aspect:
        a = cls(*args, **kw)
        a.set_composite(self)
        self._aspects[cls] = a
        return a

    def get_aspect(self, cls: Type) -> Optional[Aspect]:
        return self._aspects.get(cls)

    def has_aspect(self, cls: Type) -> bool:
        return cls in self._aspects

    def remove_aspect(self, cls: Type) -> None:
        self._aspects.pop(cls, None)
