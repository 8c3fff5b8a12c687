#include "openCL_functions.h"
cl_mem frame_mem; cl_mem dpb_mem; cl_mem ans_mem;
cl_command_queue cmd_queue; cl_context context; cl_kernel kernel[2];
int *predModes16x16 = 0; int *predModes4x4 = 0;
void InitCL() {}
void CloseCL() {}
void AllocateFrameBuffersCL() {}
void IntraCL() {}
void WaitIntraCL(int) {}
void subtractFramesCL(unsigned char*, unsigned char*) {}
bool OpenCLEnabled = false;
