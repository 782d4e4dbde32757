// Native video ingest: FFmpeg (libavformat/libavcodec/libswscale) decoder
// exposed through a small C API for ctypes.
//
// TPU-native replacement for the decord dependency the reference uses for
// every dataset's load_video (CLIP-ViP/src/datasets/dataset_video_retrieval.py:97-107,
// built in CLIP-ViP/docker/Dockerfile:110-122). TPUs have no video decoder,
// so decode stays host-side C++: demux -> seek to the keyframe before each
// requested index -> decode forward -> swscale to RGB24 at the requested
// size, writing straight into a caller-provided [n, h, w, 3] uint8 buffer
// that the Python side hands to jax.device_put (one copy, no PIL/np churn).
//
// API (all functions return 0 on success, negative AVERROR on failure):
//   xvr_open(path)                      -> opaque handle (NULL on failure)
//   xvr_num_frames(h) / xvr_fps(h) / xvr_width(h) / xvr_height(h)
//   xvr_read_frames(h, indices, n, out, out_h, out_w)
//   xvr_close(h)
//
// Thread-safety: one handle per thread; distinct handles are independent.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Reader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;
  int stream_index = -1;
  int64_t num_frames = 0;
  double fps = 0.0;
  int width = 0;
  int height = 0;
  int sws_w = 0, sws_h = 0;
  // decode cursor: index of the next frame decode will produce, -1 unknown
  int64_t cursor = -1;
};

int64_t count_frames(Reader* r) {
  AVStream* st = r->fmt->streams[r->stream_index];
  if (st->nb_frames > 0) return st->nb_frames;
  // estimate from duration * fps
  if (st->duration > 0 && r->fps > 0) {
    double secs = st->duration * av_q2d(st->time_base);
    return static_cast<int64_t>(secs * r->fps + 0.5);
  }
  if (r->fmt->duration > 0 && r->fps > 0) {
    double secs = r->fmt->duration / static_cast<double>(AV_TIME_BASE);
    return static_cast<int64_t>(secs * r->fps + 0.5);
  }
  return 0;
}

}  // namespace

extern "C" {

void* xvr_open(const char* path) {
  av_log_set_level(AV_LOG_ERROR);
  Reader* r = new Reader();
  if (avformat_open_input(&r->fmt, path, nullptr, nullptr) < 0) {
    delete r;
    return nullptr;
  }
  if (avformat_find_stream_info(r->fmt, nullptr) < 0) {
    avformat_close_input(&r->fmt);
    delete r;
    return nullptr;
  }
  const AVCodec* dec = nullptr;
  r->stream_index = av_find_best_stream(r->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
  if (r->stream_index < 0 || dec == nullptr) {
    avformat_close_input(&r->fmt);
    delete r;
    return nullptr;
  }
  AVStream* st = r->fmt->streams[r->stream_index];
  r->codec = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(r->codec, st->codecpar);
  r->codec->thread_count = 0;  // auto
  if (avcodec_open2(r->codec, dec, nullptr) < 0) {
    avcodec_free_context(&r->codec);
    avformat_close_input(&r->fmt);
    delete r;
    return nullptr;
  }
  AVRational fr = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
  r->fps = fr.den ? av_q2d(fr) : 0.0;
  r->width = r->codec->width;
  r->height = r->codec->height;
  r->num_frames = count_frames(r);
  return r;
}

long long xvr_num_frames(void* handle) { return static_cast<Reader*>(handle)->num_frames; }
double xvr_fps(void* handle) { return static_cast<Reader*>(handle)->fps; }
int xvr_width(void* handle) { return static_cast<Reader*>(handle)->width; }
int xvr_height(void* handle) { return static_cast<Reader*>(handle)->height; }

void xvr_close(void* handle) {
  Reader* r = static_cast<Reader*>(handle);
  if (r->sws) sws_freeContext(r->sws);
  if (r->codec) avcodec_free_context(&r->codec);
  if (r->fmt) avformat_close_input(&r->fmt);
  delete r;
}

// Decode the next frame into *frame. Returns 0 on success, <0 on error/EOF.
static int decode_next(Reader* r, AVFrame* frame) {
  AVPacket* pkt = av_packet_alloc();
  int ret;
  while (true) {
    ret = avcodec_receive_frame(r->codec, frame);
    if (ret == 0) break;
    if (ret != AVERROR(EAGAIN)) {
      if (ret == AVERROR_EOF) break;
      break;
    }
    ret = av_read_frame(r->fmt, pkt);
    if (ret < 0) {
      avcodec_send_packet(r->codec, nullptr);  // flush
      ret = avcodec_receive_frame(r->codec, frame);
      break;
    }
    if (pkt->stream_index == r->stream_index) {
      avcodec_send_packet(r->codec, pkt);
    }
    av_packet_unref(pkt);
  }
  av_packet_free(&pkt);
  return ret;
}

static int seek_to(Reader* r, int64_t frame_index) {
  AVStream* st = r->fmt->streams[r->stream_index];
  double secs = r->fps > 0 ? frame_index / r->fps : 0.0;
  int64_t ts = static_cast<int64_t>(secs / av_q2d(st->time_base));
  if (st->start_time != AV_NOPTS_VALUE) ts += st->start_time;
  int ret = av_seek_frame(r->fmt, r->stream_index, ts, AVSEEK_FLAG_BACKWARD);
  if (ret < 0) return ret;
  avcodec_flush_buffers(r->codec);
  r->cursor = -1;  // unknown until we see a pts
  return 0;
}

static int64_t frame_index_of(Reader* r, const AVFrame* frame) {
  AVStream* st = r->fmt->streams[r->stream_index];
  int64_t pts = frame->best_effort_timestamp;
  if (pts == AV_NOPTS_VALUE) return -1;
  if (st->start_time != AV_NOPTS_VALUE) pts -= st->start_time;
  double secs = pts * av_q2d(st->time_base);
  return static_cast<int64_t>(secs * r->fps + 0.5);
}

int xvr_read_frames(void* handle, const long long* indices, int n, uint8_t* out,
                    int out_h, int out_w) {
  Reader* r = static_cast<Reader*>(handle);
  if (n <= 0) return 0;

  // process in sorted order, writing to the original slots
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int a, int b) { return indices[a] < indices[b]; });

  if (r->sws == nullptr || r->sws_w != out_w || r->sws_h != out_h) {
    if (r->sws) sws_freeContext(r->sws);
    r->sws = sws_getContext(r->width, r->height, r->codec->pix_fmt, out_w, out_h,
                            AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr, nullptr, nullptr);
    r->sws_w = out_w;
    r->sws_h = out_h;
    if (!r->sws) return -1;
  }

  AVFrame* frame = av_frame_alloc();
  const size_t frame_bytes = static_cast<size_t>(out_h) * out_w * 3;
  int64_t last_written = -1;
  uint8_t* last_ptr = nullptr;
  int wrote = 0;

  for (int oi = 0; oi < n; ++oi) {
    int slot = order[oi];
    int64_t want = indices[slot];
    uint8_t* dst = out + static_cast<size_t>(slot) * frame_bytes;
    if (want == last_written && last_ptr != nullptr) {
      std::memcpy(dst, last_ptr, frame_bytes);
      ++wrote;
      continue;
    }
    // decide: continue decoding forward, or seek (gap too large / behind)
    bool need_seek = r->cursor < 0 || want < r->cursor || want > r->cursor + 64;
    if (need_seek) {
      if (seek_to(r, want) < 0) {
        // fall back to decode-from-start
        if (seek_to(r, 0) < 0) break;
      }
    }
    // decode until the wanted frame
    int guard = 0;
    while (true) {
      int ret = decode_next(r, frame);
      if (ret < 0) break;
      int64_t idx = frame_index_of(r, frame);
      if (idx < 0) idx = (r->cursor >= 0) ? r->cursor : 0;
      r->cursor = idx + 1;
      if (idx >= want || ++guard > 4096) {
        uint8_t* planes[1] = {dst};
        int strides[1] = {out_w * 3};
        sws_scale(r->sws, frame->data, frame->linesize, 0, r->height, planes, strides);
        last_written = want;
        last_ptr = dst;
        ++wrote;
        av_frame_unref(frame);
        break;
      }
      av_frame_unref(frame);
    }
  }
  av_frame_free(&frame);
  return wrote == n ? 0 : -(n - wrote);
}

}  // extern "C"
