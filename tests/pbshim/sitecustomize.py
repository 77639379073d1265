"""Protobuf-runtime shim for Spark's transformWithState state protocol.

This container has no ``google.protobuf`` pip package, but Spark 4's
``transformWithStateInPandas`` Python worker speaks protobuf to the JVM
state server through the generated module
``pyspark.sql.streaming.proto.StateMessage_pb2`` (imported lazily inside
the state clients). The system gcloud SDK ships a PURE-PYTHON protobuf
runtime under the rewritten namespace ``cloudsdk.google.protobuf``
(version 4.23.2 — no C extension needed), and protobuf wire format +
serialized descriptors are cross-version stable, so the generated module
runs unmodified on it after two mechanical rewrites:

1. drop the ``runtime_version`` import + gencode/runtime version check
   (the module only exists in protobuf >= 5; the 6.33-generated
   descriptor parses fine on 4.23 — verified by message round-trips);
2. retarget ``from google.protobuf ...`` at ``cloudsdk.google.protobuf``.

This file is BOTH a ``sitecustomize`` (auto-imported by every Python
process whose PYTHONPATH includes tests/pbshim — which is how Spark's
daemon-spawned Python WORKERS get the shim; tests/conftest.py prepends
it to PYTHONPATH before the driver JVM launches) and an importable
module exposing ``install()`` / ``available()`` for the driver process.

The shim is a no-op when a real ``google.protobuf`` is importable or
when the gcloud runtime is absent: it never shadows a real install.
Scope: TEST INFRASTRUCTURE ONLY — production clusters install the
standard ``protobuf`` PySpark extra and never load this file.
"""

from __future__ import annotations

import importlib.abc
import importlib.machinery
import importlib.util
import os
import re
import sys

_PB2_NAME = "pyspark.sql.streaming.proto.StateMessage_pb2"
_CLOUDSDK_THIRD_PARTY = "/usr/lib/google-cloud-sdk/lib/third_party"


def _gcloud_runtime_present() -> bool:
    return os.path.isdir(
        os.path.join(_CLOUDSDK_THIRD_PARTY, "cloudsdk", "google", "protobuf")
    )


def _real_protobuf_present() -> bool:
    # Probe a concrete submodule, not the package: Spark WORKERS have
    # spark-core's jar on sys.path, and its bundled google/protobuf/
    # *.proto resources make zipimport report an EMPTY namespace package
    # for "google.protobuf" (origin None, no code) — which is not a
    # usable runtime. A real install has google.protobuf.descriptor.
    try:
        return importlib.util.find_spec("google.protobuf.descriptor") is not None
    except (ImportError, ValueError, AttributeError):
        return False


def available() -> bool:
    """True if transformWithState's protocol can run in this process —
    either a real protobuf install or the gcloud shim path."""
    return _real_protobuf_present() or _gcloud_runtime_present()


class _Pb2ShimLoader(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    """Lazily builds the retargeted StateMessage_pb2 on first import."""

    def find_spec(self, name, path=None, target=None):
        if name != _PB2_NAME:
            return None
        if _real_protobuf_present() or not _gcloud_runtime_present():
            return None  # stand down: real runtime wins / nothing to shim
        return importlib.machinery.ModuleSpec(name, self)

    def create_module(self, spec):
        return None  # default module object

    def exec_module(self, module):
        if _CLOUDSDK_THIRD_PARTY not in sys.path:
            sys.path.append(_CLOUDSDK_THIRD_PARTY)
        proto_pkg = importlib.import_module("pyspark.sql.streaming.proto")
        src_path = os.path.join(
            os.path.dirname(proto_pkg.__file__), "StateMessage_pb2.py"
        )
        # Spark workers import pyspark from pyspark.zip — the source is
        # then only reachable through the package's resource reader
        # (zipimport), not open(); plain installs fall back to the file.
        try:
            from importlib.resources import files

            src = files(proto_pkg).joinpath("StateMessage_pb2.py").read_text(
                encoding="utf-8"
            )
        except Exception:
            with open(src_path, encoding="utf-8") as f:
                src = f.read()
        src = src.replace(
            "from google.protobuf import runtime_version as _runtime_version\n",
            "",
        )
        src = re.sub(
            r"_runtime_version\.ValidateProtobufRuntimeVersion\(.*?\)\n",
            "",
            src,
            flags=re.S,
        )
        src = src.replace("from google.protobuf", "from cloudsdk.google.protobuf")
        code = compile(src, src_path + " (pbshim)", "exec")
        exec(code, module.__dict__)
        self._self_test(module)

    @staticmethod
    def _self_test(module) -> None:
        """Round-trip one StateMessage at install time so a future Spark
        upgrade whose generated descriptor is incompatible with the 4.23
        gcloud runtime fails LOUDLY here, not as corrupted state traffic
        mid-test (the stripped gencode/runtime version check existed to
        catch exactly that class)."""
        try:
            req = module.StateRequest(version=42)
            wire = req.SerializeToString()
            back = module.StateRequest()
            back.ParseFromString(wire)
            ok = back.version == 42
        except Exception as exc:  # noqa: BLE001 — diagnose, then raise
            raise ImportError(
                "pbshim self-test: StateMessage round-trip raised on the "
                "gcloud protobuf runtime — the generated module is no "
                f"longer runtime-compatible; do not strip the version "
                f"check blindly ({exc!r})"
            ) from exc
        if not ok:
            raise ImportError(
                "pbshim self-test: StateMessage round-trip corrupted a "
                "field value on the gcloud protobuf runtime — generated "
                "module / runtime incompatibility"
            )


def install() -> None:
    """Idempotently register the shim finder in this process."""
    if any(isinstance(f, _Pb2ShimLoader) for f in sys.meta_path):
        return
    sys.meta_path.insert(0, _Pb2ShimLoader())


install()

