from scx.telemetry.snapshots import FrameTelemetry, TelemetryHub
