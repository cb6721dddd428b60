"""FreenectDataEngine with mocked ROS — exercises the adapter's callback
path, pose conversion, and drop-on-full queueing without a ROS install.

(The reference adapter was only ever run against a live robot; this pins
its behavior in CI form.)
"""

import sys
import types

import numpy as np
import pytest

from mrcc_tpu.utils.ros_utils import (
    arrays_to_pointcloud2_data,
    pointcloud2_to_arrays,
)


@pytest.fixture()
def fake_ros(monkeypatch):
    """Install minimal rospy/sensor_msgs/geometry_msgs stand-ins."""
    rospy = types.ModuleType("rospy")
    rospy.Subscriber = lambda *a, **k: None
    rospy.init_node = lambda *a, **k: None
    sensor = types.ModuleType("sensor_msgs")
    sensor_msg = types.ModuleType("sensor_msgs.msg")
    sensor_msg.PointCloud2 = object
    sensor.msg = sensor_msg
    geom = types.ModuleType("geometry_msgs")
    geom_msg = types.ModuleType("geometry_msgs.msg")
    geom_msg.PoseStamped = object
    geom.msg = geom_msg
    for name, mod in [("rospy", rospy), ("sensor_msgs", sensor),
                      ("sensor_msgs.msg", sensor_msg),
                      ("geometry_msgs", geom),
                      ("geometry_msgs.msg", geom_msg)]:
        monkeypatch.setitem(sys.modules, name, mod)
    return rospy


class FakePose:
    class _P:
        x, y, z = 0.1, 0.2, 0.3

    class _O:
        x, y, z, w = 0.0, 0.0, 0.0, 1.0

    class _PoseBody:
        pass

    def __init__(self):
        self.pose = self._PoseBody()
        self.pose.position = self._P()
        self.pose.orientation = self._O()


class TestFreenectEngine:
    def test_requires_ros(self):
        from mrcc_tpu.app.freenect_data_engine import FreenectDataEngine

        if "rospy" not in sys.modules:
            with pytest.raises(RuntimeError, match="ROS"):
                FreenectDataEngine()

    def test_pose_callback_converts_xyzw_to_wxyz(self, fake_ros):
        from mrcc_tpu.app.freenect_data_engine import FreenectDataEngine

        eng = FreenectDataEngine()
        eng._on_pose(FakePose())
        # identity quaternion xyzw (0,0,0,1) -> wxyz (1,0,0,0)
        np.testing.assert_allclose(eng._pose,
                                   [0.1, 0.2, 0.3, 1.0, 0.0, 0.0, 0.0])

    def test_cloud_callback_fills_queue_and_drops_when_full(self, fake_ros):
        from mrcc_tpu.app.freenect_data_engine import FreenectDataEngine

        eng = FreenectDataEngine()
        pts = np.random.default_rng(0).normal(size=(100, 3)).astype(
            np.float32)
        rgb = np.random.default_rng(1).random((100, 3)).astype(np.float32)
        eng._on_pose(FakePose())
        eng._on_cloud(pts, rgb)
        eng._on_cloud(pts * 2, rgb)  # queue size 1 -> dropped
        dto = eng.get()
        np.testing.assert_allclose(dto.points, pts)  # first wins
        assert dto.ee2base_pose is not None
        assert eng._queue.empty()


class TestPointCloud2Codec:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(64, 3)).astype(np.float32)
        rgb = rng.random((64, 3)).astype(np.float32)
        data, step, fields = arrays_to_pointcloud2_data(pts, rgb)

        class Field:
            def __init__(self, name, offset, datatype):
                self.name, self.offset, self.datatype = name, offset, datatype

        class Msg:
            pass

        msg = Msg()
        msg.fields = [Field(*f) for f in fields]
        msg.point_step = step
        msg.width, msg.height = 64, 1
        msg.data = data
        back_pts, back_rgb = pointcloud2_to_arrays(msg)
        np.testing.assert_allclose(back_pts, pts, rtol=1e-6)
        np.testing.assert_allclose(back_rgb, rgb, atol=2.0 / 255)
