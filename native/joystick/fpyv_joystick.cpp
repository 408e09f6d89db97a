// Native Linux joystick adapter for fpyv_tpu RC input.
//
// The reference binds Windows winmm.dll via ctypes for RC-transmitter input
// (src/utils/joystickapi.py: joyGetNumDevs/joyGetDevCaps/joyGetPosEx). This
// is the Linux-native equivalent: a small C ABI over the kernel joystick
// interface (/dev/input/js*), consumed from Python via ctypes
// (fpyv_tpu/inputs/joystick_native.py).
//
// Build: g++ -O2 -shared -fPIC fpyv_joystick.cpp -o libfpyv_joystick.so
// (done on demand by fpyv_tpu.inputs.build_native)

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstring>

#include <fcntl.h>
#include <linux/joystick.h>
#include <sys/ioctl.h>
#include <unistd.h>

namespace {
constexpr int kMaxAxes = 32;
constexpr int kMaxButtons = 64;

struct Device {
  int fd = -1;
  int n_axes = 0;
  int n_buttons = 0;
  int32_t axes[kMaxAxes] = {0};
  int32_t buttons[kMaxButtons] = {0};
};

constexpr int kMaxDevices = 16;
Device g_devices[kMaxDevices];

Device* get(int handle) {
  if (handle < 0 || handle >= kMaxDevices) return nullptr;
  if (g_devices[handle].fd < 0) return nullptr;
  return &g_devices[handle];
}
}  // namespace

extern "C" {

// Probe how many /dev/input/js* devices exist (the joyGetNumDevs analog).
int fj_num_devices() {
  int count = 0;
  char path[32];
  for (int i = 0; i < kMaxDevices; ++i) {
    snprintf(path, sizeof(path), "/dev/input/js%d", i);
    int fd = open(path, O_RDONLY | O_NONBLOCK);
    if (fd >= 0) {
      ++count;
      close(fd);
    }
  }
  return count;
}

// Open device index i. Returns a handle >= 0, or -errno.
int fj_open(int index) {
  if (index < 0 || index >= kMaxDevices) return -EINVAL;
  if (g_devices[index].fd >= 0) return index;  // already open
  char path[32];
  snprintf(path, sizeof(path), "/dev/input/js%d", index);
  int fd = open(path, O_RDONLY | O_NONBLOCK);
  if (fd < 0) return -errno;
  Device& d = g_devices[index];
  d.fd = fd;
  uint8_t n = 0;
  ioctl(fd, JSIOCGAXES, &n);
  d.n_axes = n < kMaxAxes ? n : kMaxAxes;
  ioctl(fd, JSIOCGBUTTONS, &n);
  d.n_buttons = n < kMaxButtons ? n : kMaxButtons;
  memset(d.axes, 0, sizeof(d.axes));
  memset(d.buttons, 0, sizeof(d.buttons));
  return index;
}

void fj_close(int handle) {
  Device* d = get(handle);
  if (!d) return;
  close(d->fd);
  d->fd = -1;
}

int fj_num_axes(int handle) {
  Device* d = get(handle);
  return d ? d->n_axes : -EBADF;
}

int fj_num_buttons(int handle) {
  Device* d = get(handle);
  return d ? d->n_buttons : -EBADF;
}

// Device name into buf; returns name length or -errno.
int fj_name(int handle, char* buf, int buf_len) {
  Device* d = get(handle);
  if (!d) return -EBADF;
  int r = ioctl(d->fd, JSIOCGNAME(buf_len), buf);
  return r < 0 ? -errno : r;
}

// Drain all pending events and update internal state. Returns number of
// events processed (0 if none pending), or -errno on real errors.
int fj_poll(int handle) {
  Device* d = get(handle);
  if (!d) return -EBADF;
  struct js_event ev;
  int processed = 0;
  while (true) {
    ssize_t r = read(d->fd, &ev, sizeof(ev));
    if (r != sizeof(ev)) {
      if (r < 0 && (errno == EAGAIN || errno == EWOULDBLOCK)) break;
      if (r < 0) return -errno;
      break;
    }
    int type = ev.type & ~JS_EVENT_INIT;
    if (type == JS_EVENT_AXIS && ev.number < d->n_axes) {
      d->axes[ev.number] = ev.value;  // int16 range [-32767, 32767]
    } else if (type == JS_EVENT_BUTTON && ev.number < d->n_buttons) {
      d->buttons[ev.number] = ev.value;
    }
    ++processed;
  }
  return processed;
}

// Copy current axis values (after fj_poll) into out[0..n-1].
int fj_read_axes(int handle, int32_t* out, int n) {
  Device* d = get(handle);
  if (!d) return -EBADF;
  int m = n < d->n_axes ? n : d->n_axes;
  memcpy(out, d->axes, m * sizeof(int32_t));
  return m;
}

int fj_read_buttons(int handle, int32_t* out, int n) {
  Device* d = get(handle);
  if (!d) return -EBADF;
  int m = n < d->n_buttons ? n : d->n_buttons;
  memcpy(out, d->buttons, m * sizeof(int32_t));
  return m;
}

}  // extern "C"
