"""Atlas: multi-map container for elastic failure recovery.

Mirrors the reference's ``Atlas`` (``slam_framework/src/Atlas.cc``) semantics:
on unrecoverable tracking loss the system freezes the active map and starts a
fresh one (``Tracking::CreateMapInAtlas``, Tracking.cc:2548-2583); active maps
with fewer than 10 keyframes are discarded instead of kept
(``ResetActiveMap``, Tracking.cc:3698). Frozen maps remain queryable (their
keyframes stay available to relocalization, matching the reference's shared
KeyFrameDatabase across the atlas).

Array-world design: a "map" is the bundle of fixed-capacity pools the system
tracks (visual map state + per-KF LiDAR store + per-KF BoW words + IMU
snapshots); the atlas is a host-side list of frozen bundles plus the active
one. Unlike the reference — which restarts each sub-map at the origin — the
new map is anchored at the last tracked pose, so the exported trajectory
stays continuous across recoveries.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from . import mapstate


@dataclass
class MapBundle:
    """Everything that constitutes one sub-map."""

    map: mapstate.MapState
    lidar_store: Any = None       # local_mapping.LidarStore | None
    kf_words: Any = None          # [K, F] int32 | None
    imu_store: Any = None         # imu_mode.ImuKfStore | None
    n_kf: int = 0                 # host mirror of map.n_kf
    map_id: int = 0               # creation index in the atlas


@dataclass
class Atlas:
    """Active map + frozen history (Atlas.cc: mspMaps + mpCurrentMap)."""

    frozen: list[MapBundle] = field(default_factory=list)
    n_created: int = 1            # total maps ever created (incl. active)
    n_discarded: int = 0

    def freeze_or_discard(self, bundle: MapBundle, min_kf: int = 10) -> bool:
        """CreateMapInAtlas/ResetActiveMap policy: keep maps worth keeping.

        Returns True if the map was preserved, False if discarded.
        """
        self.n_created += 1
        if bundle.n_kf >= min_kf:
            self.frozen.append(bundle)
            return True
        self.n_discarded += 1
        return False

    @property
    def n_maps(self) -> int:
        """Number of live maps (frozen + the active one)."""
        return len(self.frozen) + 1
