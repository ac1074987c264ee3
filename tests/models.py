"""Small MJCF models used by the test suite (authored for this project)."""

PENDULUM = """
<mujoco model="pendulum">
  <option timestep="0.005" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="arm" pos="0 0 1">
      <joint name="pivot" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom name="rod" type="capsule" fromto="0 0 0 0 0 -0.5" size="0.02"
            contype="0" conaffinity="0"/>
      <body name="bob" pos="0 0 -0.5">
        <geom name="ball" type="sphere" size="0.05" mass="0.3"
              contype="0" conaffinity="0"/>
        <site name="tip" pos="0 0 0"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor name="torque" joint="pivot" gear="2" ctrlrange="-1 1"
           ctrllimited="true"/>
  </actuator>
  <sensor>
    <jointpos name="angle" joint="pivot"/>
    <jointvel name="speed" joint="pivot"/>
    <framepos name="tip_pos" objtype="site" objname="tip"/>
    <framelinvel name="tip_vel" objtype="site" objname="tip"/>
  </sensor>
</mujoco>
"""

CARTPOLE = """
<mujoco model="cartpole">
  <option timestep="0.01" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="cart" pos="0 0 1">
      <joint name="slider" type="slide" axis="1 0 0" damping="0.05"/>
      <geom name="cart_geom" type="box" size="0.1 0.05 0.05" mass="1"
            contype="0" conaffinity="0"/>
      <body name="pole" pos="0 0 0">
        <joint name="hinge" type="hinge" axis="0 1 0" armature="0.01"/>
        <geom name="pole_geom" type="capsule" fromto="0 0 0 0 0 0.6"
              size="0.02" mass="0.1" contype="0" conaffinity="0"/>
        <site name="tip" pos="0 0 0.6"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor name="slide_motor" joint="slider" gear="10" ctrlrange="-1 1"
           ctrllimited="true"/>
  </actuator>
  <sensor>
    <jointpos name="cart_pos" joint="slider"/>
    <jointpos name="pole_angle" joint="hinge"/>
    <framepos name="tip_pos" objtype="site" objname="tip"/>
  </sensor>
</mujoco>
"""

ARM3D = """
<mujoco model="arm3d">
  <option timestep="0.005" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="base" pos="0 0 0.5">
      <joint name="shoulder" type="ball" damping="0.2" armature="0.05"/>
      <geom name="upper" type="capsule" fromto="0 0 0 0.3 0 0" size="0.03"
            contype="0" conaffinity="0"/>
      <body name="fore" pos="0.3 0 0">
        <joint name="elbow" type="hinge" axis="0 0 1"
               damping="0.1" armature="0.02"/>
        <geom name="lower" type="capsule" fromto="0 0 0 0.25 0 0"
              size="0.025" contype="0" conaffinity="0"/>
        <body name="wrist" pos="0.25 0 0">
          <joint name="twist" type="hinge" axis="1 0 0" damping="0.05"
               armature="0.02"/>
          <geom name="hand" type="sphere" size="0.04" mass="0.2"
                contype="0" conaffinity="0"/>
          <site name="ee" pos="0 0 0"/>
        </body>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor name="elbow_motor" joint="elbow" gear="1"/>
    <position name="twist_pos" joint="twist" kp="5" kv="0.5"/>
  </actuator>
  <sensor>
    <framepos name="ee_pos" objtype="site" objname="ee"/>
    <framequat name="hand_quat" objtype="body" objname="wrist"/>
    <frameangvel name="hand_angvel" objtype="body" objname="wrist"/>
  </sensor>
</mujoco>
"""

FREEBODY = """
<mujoco model="freebody">
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="block" pos="0 0 2">
      <joint name="root" type="free"/>
      <geom name="box" type="box" size="0.1 0.07 0.05" mass="0.5"
            contype="0" conaffinity="0"/>
      <site name="corner" pos="0.1 0.07 0.05"/>
    </body>
  </worldbody>
  <sensor>
    <framepos name="pos" objtype="body" objname="block"/>
    <framequat name="quat" objtype="body" objname="block"/>
    <framelinvel name="vel" objtype="site" objname="corner"/>
  </sensor>
</mujoco>
"""

BALL_ON_PLANE = """
<mujoco model="ball_on_plane">
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1" friction="1 0.005 0.0001"/>
    <body name="ball" pos="0 0 0.5">
      <joint name="root" type="free"/>
      <geom name="sphere" type="sphere" size="0.1" mass="0.3"
            friction="1 0.005 0.0001"/>
    </body>
  </worldbody>
</mujoco>
"""

BOX_ON_PLANE = """
<mujoco model="box_on_plane">
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body name="box" pos="0 0 0.3">
      <joint name="root" type="free"/>
      <geom name="box" type="box" size="0.1 0.08 0.06" mass="0.4"/>
    </body>
  </worldbody>
</mujoco>
"""

LIMITED = """
<mujoco model="limited">
  <compiler angle="radian"/>
  <option timestep="0.005" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="arm" pos="0 0 1">
      <joint name="pivot" type="hinge" axis="0 1 0" range="-0.5 0.5"
             limited="true" damping="0.02"/>
      <geom name="rod" type="capsule" fromto="0 0 0 0.4 0 0" size="0.02"
            contype="0" conaffinity="0"/>
    </body>
  </worldbody>
</mujoco>
"""
