"""Best-effort ``google.protobuf`` provisioning for the
``transformWithStateInPandas`` state-server protocol — WITHOUT
installing anything.

Why this exists: Spark 4's TWS Python API speaks protobuf between the
JVM state server and the Python worker
(pyspark/sql/streaming/proto/StateMessage_pb2.py), but this container
has no ``google.protobuf`` distribution and no network, and package
installs are out of scope. The machine DOES ship a complete relocated
pure-Python protobuf runtime (v4.23.2) inside the Google Cloud SDK at
``third_party/cloudsdk/google/protobuf`` (every internal import
rewritten to the ``cloudsdk.google.protobuf`` prefix). ``install()``
aliases that package into ``sys.modules`` under its canonical name so
``import google.protobuf`` resolves to it.

The one deliberate compatibility bridge: pyspark's generated pb2 was
emitted by protoc 6.33 and imports ``google.protobuf.runtime_version``
(which first appeared in protobuf 5.x) to run
``ValidateProtobufRuntimeVersion``. We register a stand-in for that
module that waives validation ONLY for pyspark-located gencode (any
other caller gets a real VersionError). That is safe here because (a) StateMessage.proto is plain
proto3 — its serialized FileDescriptorProto parses under any 4.x
runtime, (b) the generated code uses only the
``internal.builder.BuildMessageAndEnumDescriptors`` API present since
protobuf 4.21, and (c) correctness is not assumed but PROVEN
downstream: the TWS twin's totals must match the batch oracle
bit-for-bit (tests/test_streaming.py), which exercises serialize /
parse of every message the state protocol uses. If any of that ever
fails, ``install()`` returning False (or the test failing) keeps the
operator gated exactly as before.

THREE processes need the shim: the driver session, the TWS *driver
worker* the JVM spawns for PRE_INIT/state-schema validation, and
every executor python worker. The last two get it from the
StatefulProcessor's ``__setstate__`` (streaming/stateful.py) —
unpickling the UDF is the first Python those processes run, and it
happens before the API client's first lazy StateMessage_pb2 import
(PRE_INIT's ``set_handle_state`` fires before ``init``, so an
init-time hook alone is too late — observed live).

The Cloud SDK path is appended (not prepended) to ``sys.path``, so
its 2019-era bundled packages can never shadow stdlib or
site-packages modules — only the ``cloudsdk`` package itself becomes
importable, and only while resolving the protobuf tree.
"""

from __future__ import annotations

import importlib
import importlib.util
import os
import sys
import types

_CLOUDSDK_THIRD_PARTY = "/usr/lib/google-cloud-sdk/lib/third_party"


class _AliasLoader:
    """Loader that hands the import machinery an ALREADY-LOADED
    cloudsdk module object, then restores the identity attributes
    (__name__/__spec__/__loader__/__package__) the machinery
    overwrites — so ``google.protobuf.X`` and
    ``cloudsdk.google.protobuf.X`` stay ONE module object with one
    canonical identity, never a re-executed copy."""

    def __init__(self, mod: types.ModuleType) -> None:
        self._mod = mod
        self._keep = {a: getattr(mod, a, None)
                      for a in ("__name__", "__spec__",
                                "__loader__", "__package__")}

    def create_module(self, spec):
        return self._mod

    def exec_module(self, module) -> None:
        for attr, val in self._keep.items():
            if val is not None:
                setattr(module, attr, val)


class _ProtobufAliasFinder:
    """Meta-path finder mapping the ENTIRE ``google.protobuf``
    namespace onto ``cloudsdk.google.protobuf`` for all FUTURE
    imports (r7 advisory): the earlier one-shot ``sys.modules``
    snapshot only covered submodules loaded eagerly at install()
    time, so any later ``google.protobuf.X`` import (e.g. a
    well-known-type pb2 a pyspark upgrade starts using) would
    re-execute the cloudsdk file under the canonical name —
    exactly the duplicate-descriptor / isinstance hazard the
    aliasing exists to prevent. ``sys.modules`` is consulted before
    meta_path, so already-aliased names short-circuit and this
    finder only fires for genuinely new submodules."""

    _PREFIX = "google.protobuf"

    def find_spec(self, fullname, path=None, target=None):
        if fullname != self._PREFIX and \
                not fullname.startswith(self._PREFIX + "."):
            return None
        try:
            mod = importlib.import_module("cloudsdk." + fullname)
        except ImportError:
            return None
        return importlib.util.spec_from_loader(
            fullname, _AliasLoader(mod),
            is_package=hasattr(mod, "__path__"))

    def find_module(self, fullname, path=None):  # pragma: no cover
        return None  # legacy protocol: find_spec is authoritative


def install() -> bool:
    """Make ``google.protobuf`` importable. Idempotent; returns
    availability. Never raises."""
    try:
        # importing the package alone is NOT sufficient evidence: a
        # bare google/ directory on some sys.path entry makes
        # google.protobuf resolve as an EMPTY namespace package
        # (observed live in the TWS driver worker). Require the
        # module the pb2 files actually need.
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        pass
    if not os.path.isdir(
            os.path.join(_CLOUDSDK_THIRD_PARTY,
                         "cloudsdk", "google", "protobuf")):
        return False
    try:
        if _CLOUDSDK_THIRD_PARTY not in sys.path:
            sys.path.append(_CLOUDSDK_THIRD_PARTY)
        import cloudsdk.google.protobuf as pb
        # the generated pb2's imports, resolved eagerly so they exist
        # as attributes for "from google.protobuf import X"
        import cloudsdk.google.protobuf.descriptor  # noqa: F401
        import cloudsdk.google.protobuf.descriptor_pool  # noqa: F401
        import cloudsdk.google.protobuf.symbol_database  # noqa: F401
        import cloudsdk.google.protobuf.internal.builder  # noqa: F401

        if "google" not in sys.modules:
            google = types.ModuleType("google")
            google.__path__ = []  # namespace-ish: no real file backing
            sys.modules["google"] = google
        sys.modules["google"].protobuf = pb
        sys.modules["google.protobuf"] = pb
        # alias every loaded submodule under its canonical name too,
        # so "from google.protobuf.internal import builder" resolves
        # to the SAME module objects instead of re-executing the files
        # through pb.__path__ (double-loaded descriptor machinery is
        # how aliasing schemes corrupt isinstance checks)
        for name, mod in list(sys.modules.items()):
            if name.startswith("cloudsdk.google.protobuf"):
                sys.modules[name.replace("cloudsdk.", "", 1)] = mod
        # ... and a meta-path finder for every FUTURE
        # google.protobuf.* import (r7 advisory: the snapshot alone
        # leaves later submodule imports re-executing files under the
        # canonical name — single module identity must hold for the
        # process lifetime, not just at install() time)
        if not any(isinstance(f, _ProtobufAliasFinder)
                   for f in sys.meta_path):
            sys.meta_path.insert(0, _ProtobufAliasFinder())

        # runtime-version gate (module is 5.x+-only; see module
        # docstring for why bypassing it is sound for pyspark's TWS
        # protocol). Registered under BOTH names because
        # "from google.protobuf import X" resolves submodules against
        # the package's real __name__. The bypass is SCOPED (r7
        # advisory): only gencode whose `location` is a pyspark file
        # skips validation — any other 5.x+ gencode importing this
        # shim gets the honest VersionError instead of a silent
        # process-wide waiver.
        rv_name = "cloudsdk.google.protobuf.runtime_version"
        if rv_name not in sys.modules:
            rv = types.ModuleType(rv_name)

            class _Domain:
                GOOGLE_INTERNAL = 1
                PUBLIC = 2

            class _VersionError(RuntimeError):
                pass

            def _validate(domain=None, major=None, minor=None,
                          patch=None, suffix=None, location=None,
                          *a, **k):
                # pyspark's TWS gencode self-identifies by its proto
                # path "org/apache/spark/sql/execution/streaming/
                # StateMessage.proto"; a pyspark upgrade could also
                # ship "pyspark/..."-located files. Anchored at the
                # path START (not substring containment) so
                # third-party gencode whose proto path merely
                # CONTAINS "pyspark" doesn't ride the waiver.
                loc = str(location)
                if location is not None and (
                        loc.startswith("pyspark/")
                        or loc.startswith("org/apache/spark/")):
                    return  # the audited TWS StateMessage allowance
                raise _VersionError(
                    f"vendored protobuf 4.23.2 shim: gencode "
                    f"{major}.{minor}.{patch} at {location!r} is "
                    "outside the pyspark TWS allowance (see "
                    "vendor_protobuf.py docstring)")

            rv.Domain = _Domain
            rv.ValidateProtobufRuntimeVersion = _validate
            rv.VersionError = _VersionError
            sys.modules[rv_name] = rv
            sys.modules["google.protobuf.runtime_version"] = rv
            pb.runtime_version = rv

        from google.protobuf import descriptor  # noqa: F401
        return True
    except Exception:
        return False
