from scx.traffic.lanes import LaneGraphBuilder, LaneArrays, nearest_lane, advance_along_lane, look_ahead_point
from scx.traffic.lod import traffic_lod_update
from scx.traffic.ai import traffic_ai_update
from scx.traffic.spawner import TrafficSpawner
