from scx.app.sandbox import Sandbox, SimParams, make_sim_tick, spawn_player_vehicle
