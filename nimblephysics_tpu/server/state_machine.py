"""GUIStateMachine: retained-mode scene graph -> JSON command stream.

Reference parity: dart/server/GUIStateMachine.hpp:59-395 (create box/
sphere/capsule/line, renderWorld/renderSkeleton/renderTrajectoryLines,
text/buttons/sliders/plots, layers; serialized as protobuf CommandList).
This engine serializes the same retained-command model as JSON (the wire
format the bundled web viewer decodes); a protobuf encoding can be layered
on the same command dicts.
"""

from __future__ import annotations

import json
import threading
from typing import Dict, List, Optional, Sequence

import numpy as np

from nimblephysics_tpu.dynamics import shapes as SH
from nimblephysics_tpu.math import lie
from nimblephysics_tpu.simulation.world import World, world_fk


def _v(x) -> list:
    return np.asarray(x, dtype=np.float64).reshape(-1).tolist()


class GUIStateMachine:
    """Retained scene state + dirty command queue."""

    def __init__(self):
        self._objects: Dict[str, dict] = {}
        # Retained rich-plot data streams, keyed (plot_key, stream_name).
        self._plot_data: Dict[tuple, dict] = {}
        self._queue: List[dict] = []
        self._lock = threading.Lock()

    # -- primitives (reference: createBox/createSphere/... ) ----------------

    def _create(self, key: str, cmd: dict) -> None:
        with self._lock:
            self._objects[key] = cmd
            self._queue.append(cmd)

    def create_box(self, key, size, pos=(0, 0, 0), euler=(0, 0, 0),
                   color=(0.5, 0.5, 0.9, 1.0), layer=""):
        self._create(key, dict(type="create_box", key=key, size=_v(size),
                               pos=_v(pos), euler=_v(euler), color=_v(color),
                               layer=layer))

    def create_sphere(self, key, radius, pos=(0, 0, 0),
                      color=(0.5, 0.5, 0.9, 1.0), layer=""):
        self._create(key, dict(type="create_sphere", key=key,
                               radius=float(radius), pos=_v(pos),
                               color=_v(color), layer=layer))

    def create_capsule(self, key, radius, length, pos=(0, 0, 0),
                       euler=(0, 0, 0), color=(0.5, 0.5, 0.9, 1.0), layer=""):
        self._create(key, dict(type="create_capsule", key=key,
                               radius=float(radius), length=float(length),
                               pos=_v(pos), euler=_v(euler), color=_v(color),
                               layer=layer))

    def create_line(self, key, points, color=(1.0, 0.5, 0.5, 1.0), layer=""):
        self._create(key, dict(type="create_line", key=key,
                               points=np.asarray(points).reshape(-1, 3).tolist(),
                               color=_v(color), layer=layer))

    def create_mesh(self, key, verts, faces, pos=(0, 0, 0),
                    euler=(0, 0, 0), color=(0.5, 0.7, 0.6, 1.0), layer=""):
        self._create(key, dict(
            type="create_mesh", key=key,
            verts=np.asarray(verts, dtype=np.float64).reshape(-1, 3).tolist(),
            faces=np.asarray(faces, dtype=np.int64).reshape(-1, 3).tolist(),
            pos=_v(pos), euler=_v(euler), color=_v(color), layer=layer))

    def queue_raw(self, cmd: dict) -> None:
        """Queue a non-retained command (e.g. screenshot requests)."""
        with self._lock:
            self._queue.append(cmd)

    def create_layer(self, key, color=(1.0, 1.0, 1.0, 1.0),
                     default_show=True):
        """Reference: GUIStateMachine::createLayer — named groups the
        viewer can toggle; objects reference layers by key."""
        self._create(("layer", key), dict(type="create_layer", key=key,
                                          name=key, color=_v(color),
                                          default_show=bool(default_show)))

    def set_frames_per_second(self, fps: int):
        """Reference: GUIStateMachine::setFramesPerSecond (wire field 31)."""
        cmd = dict(type="set_frames_per_second", fps=int(fps))
        with self._lock:
            self._objects[("fps",)] = cmd
            self._queue.append(cmd)

    def clear_all(self):
        """Reference: GUIStateMachine::clear — drop the whole retained
        scene and tell clients to do the same (wire field 16)."""
        with self._lock:
            self._objects.clear()
            self._plot_data.clear()
            self._queue.append(dict(type="clear_all"))

    def set_object_scale(self, key, scale):
        """Reference: GUIStateMachine::setObjectScale (wire field 8)."""
        with self._lock:
            self._retain(key, scale=_v(scale))
            self._queue.append(dict(type="set_scale", key=key,
                                    scale=_v(scale)))

    def create_plane(self, key, normal=(0, 0, 1), offset=0.0,
                     color=(0.6, 0.6, 0.6, 1.0), layer=""):
        self._create(key, dict(type="create_plane", key=key, normal=_v(normal),
                               offset=float(offset), color=_v(color),
                               layer=layer))

    def _retain(self, key, **fields) -> None:
        """Fold a mutation into the retained create command so late-joining
        clients see current state (reference GUIStateMachine retains the
        full scene, not the command history)."""
        obj = self._objects.get(key)
        if obj is not None:
            # Copy-on-write: the pending queue may still hold the original
            # create command; never rewrite queued history.
            obj = dict(obj)
            obj.update(fields)
            self._objects[key] = obj

    def set_object_position(self, key, pos):
        with self._lock:
            self._retain(key, pos=_v(pos))
            self._queue.append(dict(type="set_pos", key=key, pos=_v(pos)))

    def set_object_rotation(self, key, euler):
        with self._lock:
            self._retain(key, euler=_v(euler))
            self._queue.append(dict(type="set_euler", key=key, euler=_v(euler)))

    def set_object_color(self, key, color):
        with self._lock:
            self._retain(key, color=_v(color))
            self._queue.append(dict(type="set_color", key=key, color=_v(color)))

    def delete_object(self, key):
        with self._lock:
            self._objects.pop(key, None)
            self._queue.append(dict(type="delete", key=key))

    # -- UI widgets (reference: createText/createButton/createSlider/Plot) --

    def create_text(self, key, contents, from_top_left=(10, 10), size=(200, 30)):
        self._create(key, dict(type="create_text", key=key, contents=contents,
                               pos=_v(from_top_left), size=_v(size)))

    def create_button(self, key, label, from_top_left=(10, 50), size=(100, 30)):
        self._create(key, dict(type="create_button", key=key, label=label,
                               pos=_v(from_top_left), size=_v(size)))

    def create_slider(self, key, from_top_left, size, min_val, max_val, value):
        self._create(key, dict(type="create_slider", key=key,
                               pos=_v(from_top_left), size=_v(size),
                               min=float(min_val), max=float(max_val),
                               value=float(value)))

    def create_plot(self, key, from_top_left, size, xs, ys,
                    min_x=None, max_x=None, min_y=None, max_y=None):
        self._create(key, dict(type="create_plot", key=key,
                               pos=_v(from_top_left), size=_v(size),
                               xs=_v(xs), ys=_v(ys)))

    def set_text_contents(self, key, contents):
        with self._lock:
            self._queue.append(dict(type="set_text", key=key, contents=contents))

    def set_button_label(self, key, label):
        """Reference: GUIStateMachine::setButtonLabel (hpp:370)."""
        with self._lock:
            self._retain(key, label=label)
            self._queue.append(dict(type="set_button_label", key=key,
                                    label=label))

    def set_slider_value(self, key, value):
        with self._lock:
            self._retain(key, value=float(value))
            self._queue.append(dict(type="set_slider_value", key=key,
                                    value=float(value)))

    def set_slider_min(self, key, value):
        """Reference: GUIStateMachine::setSliderMin (hpp:389)."""
        with self._lock:
            self._retain(key, min=float(value))
            self._queue.append(dict(type="set_slider_min", key=key,
                                    value=float(value)))

    def set_slider_max(self, key, value):
        """Reference: GUIStateMachine::setSliderMax (hpp:392)."""
        with self._lock:
            self._retain(key, max=float(value))
            self._queue.append(dict(type="set_slider_max", key=key,
                                    value=float(value)))

    # -- tooltips / warnings / drag (reference GUIStateMachine.hpp:303-333) --

    def set_object_tooltip(self, key, tooltip):
        with self._lock:
            self._retain(key, tooltip=tooltip)
            self._queue.append(dict(type="set_object_tooltip", key=key,
                                    tooltip=tooltip))

    def delete_object_tooltip(self, key):
        with self._lock:
            self._retain(key, tooltip=None)
            self._queue.append(dict(type="delete_object_tooltip", key=key))

    def set_object_tooltip_editable(self, key):
        """Reference: setObjectTooltipEditable -> EnableEditTooltip wire."""
        with self._lock:
            self._retain(key, tooltip_editable=True)
            self._queue.append(dict(type="enable_edit_tooltip", key=key))

    def set_object_drag_enabled(self, key):
        """Reference: setObjectDragEnabled -> EnableDrag wire."""
        with self._lock:
            self._retain(key, drag_enabled=True)
            self._queue.append(dict(type="enable_drag", key=key))

    def set_object_warning(self, key, warning, warning_key, layer=""):
        """Reference: GUIStateMachine::setObjectWarning (hpp:318)."""
        with self._lock:
            obj = self._objects.get(key)
            if obj is not None:
                obj = dict(obj)
                warns = dict(obj.get("warnings") or {})
                warns[warning_key] = warning
                obj["warnings"] = warns
                self._objects[key] = obj
            self._queue.append(dict(type="set_object_warning", key=key,
                                    warning=warning, warning_key=warning_key,
                                    layer=layer))

    def delete_object_warning(self, key, warning_key):
        """Reference: GUIStateMachine::deleteObjectWarning (hpp:325)."""
        with self._lock:
            obj = self._objects.get(key)
            if obj is not None and obj.get("warnings"):
                obj = dict(obj)
                warns = dict(obj["warnings"])
                warns.pop(warning_key, None)
                obj["warnings"] = warns
                self._objects[key] = obj
            self._queue.append(dict(type="delete_object_warning", key=key,
                                    warning_key=warning_key))

    def set_span_warning(self, start_timestep, end_timestep, warning_key,
                         warning, layer=""):
        """Reference: GUIStateMachine::setSpanWarning (hpp:310) — a
        timeline-span warning, not attached to any object (retained under
        its warning_key so late joiners see it)."""
        cmd = dict(type="set_span_warning",
                   start_timestep=int(start_timestep),
                   end_timestep=int(end_timestep),
                   warning_key=warning_key, warning=warning, layer=layer)
        with self._lock:
            self._objects[("span_warning", warning_key)] = cmd
            self._queue.append(cmd)

    # -- rich plots (reference: createRichPlot/setRichPlotData/Bounds,
    #    GUIStateMachine.hpp:420-447) ------------------------------------

    def create_rich_plot(self, key, from_top_left, size, min_x, max_x,
                         min_y, max_y, title="", x_axis_label="",
                         y_axis_label=""):
        self._create(key, dict(
            type="create_rich_plot", key=key, pos=_v(from_top_left),
            size=_v(size),
            bounds=[float(min_x), float(max_x), float(min_y), float(max_y)],
            title=title, x_axis_label=x_axis_label,
            y_axis_label=y_axis_label))

    def set_rich_plot_data(self, key, name, color, plot_type, xs, ys):
        """One named data stream; same `name` overwrites (reference
        setRichPlotData semantics). Streams are retained so late-joining
        clients receive current plot contents."""
        cmd = dict(type="set_rich_plot_data", key=key, name=name,
                   color=color, plot_type=plot_type, xs=_v(xs), ys=_v(ys))
        with self._lock:
            self._plot_data[(key, name)] = cmd
            self._queue.append(cmd)

    def set_rich_plot_bounds(self, key, min_x, max_x, min_y, max_y):
        bounds = [float(min_x), float(max_x), float(min_y), float(max_y)]
        with self._lock:
            self._retain(key, bounds=bounds)
            self._queue.append(dict(
                type="set_rich_plot_bounds", key=key, bounds=bounds))

    # -- textures (reference: createTexture/createTextureFromFile) ------

    def create_texture(self, key, base64_png: str):
        self._create(key, dict(type="create_texture", key=key,
                               base64=base64_png))

    def create_texture_from_file(self, key, path: str):
        import base64

        with open(path, "rb") as f:
            self.create_texture(key, base64.b64encode(f.read()).decode())

    # -- UI element placement (reference: setUIElementPosition/Size,
    #    deleteUIElement) ------------------------------------------------

    def set_ui_element_position(self, key, from_top_left):
        with self._lock:
            self._retain(key, pos=_v(from_top_left))
            self._queue.append(dict(type="set_ui_elem_pos", key=key,
                                    pos=_v(from_top_left)))

    def set_ui_element_size(self, key, size):
        with self._lock:
            self._retain(key, size=_v(size))
            self._queue.append(dict(type="set_ui_elem_size", key=key,
                                    size=_v(size)))

    def delete_ui_element(self, key):
        with self._lock:
            self._objects.pop(key, None)
            for k in [k for k in self._plot_data if k[0] == key]:
                del self._plot_data[k]
            self._queue.append(dict(type="delete_ui", key=key))

    # -- world rendering (reference: renderWorld, GUIStateMachine.cpp:46) ---

    def render_world(self, world: World, q, prefix: str = "world") -> None:
        """Create/update one object per collidable+visual shape."""
        import jax.numpy as jnp

        T_wb = np.asarray(world_fk(world, jnp.asarray(q)))
        body_off = world.body_offsets()
        for si, skel in enumerate(world.skeletons):
            for bi, body in enumerate(skel.bodies):
                gb = body_off[si] + bi
                for k, shape in enumerate(body.shapes):
                    key = f"{prefix}_{skel.name}_{body.name}_{k}"
                    T_ws = T_wb[gb] @ shape.T_offset
                    pos = T_ws[:3, 3]
                    euler = np.asarray(
                        lie.matrix_to_euler_xyz(T_ws[:3, :3])
                    )
                    color = (
                        shape.color.tolist()
                        if shape.color is not None
                        else [0.5, 0.5, 0.9, 1.0]
                    )
                    if key not in self._objects:
                        t = shape.shape_type
                        if t == SH.BOX:
                            self.create_box(key, shape.size, pos, euler, color)
                        elif t in (SH.SPHERE,):
                            self.create_sphere(key, shape.size[0], pos, color)
                        elif t in (SH.CAPSULE, SH.CYLINDER, SH.CONE):
                            self.create_capsule(
                                key, shape.size[0], shape.size[1], pos, euler,
                                color,
                            )
                        elif t == SH.ELLIPSOID:
                            self.create_sphere(
                                key, float(np.mean(shape.size)) / 2, pos, color
                            )
                        elif t == SH.PLANE:
                            p = np.asarray(shape.size, dtype=np.float64)
                            self.create_plane(key, p[:3], float(p[3]) if p.size > 3 else 0.0)
                        elif t == SH.MESH and shape.mesh_vertices is not None:
                            from nimblephysics_tpu.collision.convex import (
                                decimate_support,
                                hull_triangles,
                            )

                            v = decimate_support(
                                shape.mesh_vertices, max_verts=40
                            )
                            self.create_mesh(
                                key, v, hull_triangles(v), pos, euler, color
                            )
                        elif t == SH.LINE_SEGMENT:
                            # Reference: LineSegmentShape — polyline of
                            # shape-frame vertices (mesh_vertices rows).
                            pts = (
                                shape.mesh_vertices
                                if shape.mesh_vertices is not None
                                else np.zeros((0, 3))
                            )
                            world_pts = pts @ T_ws[:3, :3].T + T_ws[:3, 3]
                            self.create_line(key, world_pts, color)
                        elif t == SH.POINT_CLOUD:
                            # Reference: PointCloudShape — one small
                            # sphere per point (size[0] = point radius).
                            pts = (
                                shape.mesh_vertices
                                if shape.mesh_vertices is not None
                                else np.zeros((0, 3))
                            )
                            r = (
                                float(shape.size[0])
                                if np.asarray(shape.size).size
                                else 0.01
                            )
                            world_pts = pts @ T_ws[:3, :3].T + T_ws[:3, 3]
                            for pi, p in enumerate(world_pts):
                                self.create_sphere(
                                    f"{key}_p{pi}", r, p, color
                                )
                            # Group marker so later renders take the
                            # set_pos update path per point.
                            with self._lock:
                                self._objects[key] = dict(
                                    type="group", key=key
                                )
                    else:
                        t = shape.shape_type
                        if t == SH.LINE_SEGMENT:
                            pts = (
                                shape.mesh_vertices
                                if shape.mesh_vertices is not None
                                else np.zeros((0, 3))
                            )
                            world_pts = pts @ T_ws[:3, :3].T + T_ws[:3, 3]
                            self.create_line(key, world_pts, color)
                        elif t == SH.POINT_CLOUD:
                            pts = (
                                shape.mesh_vertices
                                if shape.mesh_vertices is not None
                                else np.zeros((0, 3))
                            )
                            world_pts = pts @ T_ws[:3, :3].T + T_ws[:3, 3]
                            for pi, p in enumerate(world_pts):
                                self.set_object_position(f"{key}_p{pi}", p)
                        else:
                            self.set_object_position(key, pos)
                            self.set_object_rotation(key, euler)

    def render_trajectory_lines(self, world: World, poses, prefix="traj"):
        """Reference parity: renderTrajectoryLines — one polyline per body
        COM through the pose trajectory."""
        import jax.numpy as jnp
        import jax

        traj = np.asarray(
            jax.vmap(lambda qq: world_fk(world, qq))(jnp.asarray(poses))
        )  # (T, NB, 4, 4)
        for b in range(traj.shape[1]):
            self.create_line(f"{prefix}_{b}", traj[:, b, :3, 3])

    # -- command stream -------------------------------------------------------

    def flush_commands(self) -> List[dict]:
        """Drain pending commands (one CommandList batch)."""
        with self._lock:
            cmds, self._queue = self._queue, []
            return cmds

    def full_state_commands(self) -> List[dict]:
        with self._lock:
            out: List[dict] = []
            for obj in self._objects.values():
                out.append(obj)
                # Expand retained per-object annotations into the follow-up
                # commands a late-joining client needs (the reference
                # retains these on its scene objects too,
                # GUIStateMachine.hpp:59-395).
                key = obj.get("key")
                if key is None:
                    continue
                if obj.get("tooltip"):
                    out.append(dict(type="set_object_tooltip", key=key,
                                    tooltip=obj["tooltip"]))
                if obj.get("tooltip_editable"):
                    out.append(dict(type="enable_edit_tooltip", key=key))
                if obj.get("drag_enabled"):
                    out.append(dict(type="enable_drag", key=key))
                for wk, wtext in (obj.get("warnings") or {}).items():
                    out.append(dict(type="set_object_warning", key=key,
                                    warning=wtext, warning_key=wk,
                                    layer=obj.get("layer", "")))
            out += list(self._plot_data.values())
            return out

    def flush_json(self) -> Optional[str]:
        """Drain pending commands as one JSON CommandList message."""
        cmds = self.flush_commands()
        return json.dumps({"commands": cmds}) if cmds else None

    def full_state_json(self) -> str:
        """Everything retained, for newly connected clients."""
        return json.dumps({"commands": self.full_state_commands()})
